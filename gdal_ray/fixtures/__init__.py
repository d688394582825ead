from gdal_ray.fixtures.generate import generate_corpus, corpus_dir

__all__ = ["generate_corpus", "corpus_dir"]
