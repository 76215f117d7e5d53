from .flagship import build_articles, run_extract_job  # noqa: F401
