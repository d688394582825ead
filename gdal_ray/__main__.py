from gdal_ray.cli import main

main()
