from .pages import pages_count_for_sf, read_pages, synth_pages, write_pages_parquet  # noqa: F401
