from gdal_ray.io.codec import decode_image, encode_jpeg, encode_png, encode_qlossy, psnr
from gdal_ray.io.phash import phash64, hamming64

__all__ = ["decode_image", "encode_jpeg", "encode_png", "encode_qlossy", "psnr", "phash64", "hamming64"]
