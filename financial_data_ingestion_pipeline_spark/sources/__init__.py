from . import ingest, jsonl
from .fixtures import load_fixture_tables, load_table

__all__ = ["ingest", "jsonl", "load_fixture_tables", "load_table"]
