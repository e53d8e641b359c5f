from .fixtures import load_fixture_tables, load_table

__all__ = ["load_fixture_tables", "load_table"]
