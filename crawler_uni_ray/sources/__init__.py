from .pages import read_pages, read_pages_partition_files  # noqa: F401
