from .extract_one import extract_document  # noqa: F401
