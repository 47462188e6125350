"""Index construction, codecs, merge, and reading."""
