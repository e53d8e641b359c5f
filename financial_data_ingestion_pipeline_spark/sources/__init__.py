from . import ingest, jsonl, tickgen
from .fixtures import load_fixture_tables, load_table

__all__ = ["ingest", "jsonl", "load_fixture_tables", "load_table", "tickgen"]
