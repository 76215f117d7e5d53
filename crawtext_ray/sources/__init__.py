from .pages import read_pages, read_seed_file  # noqa: F401
