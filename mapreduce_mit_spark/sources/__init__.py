from .io import load_table, load_tables, read_corpus, TABLE_NAMES

__all__ = ["load_table", "load_tables", "read_corpus", "TABLE_NAMES"]
