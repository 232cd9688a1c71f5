from .tables import TABLES, bars, load_events, load_table, load_tables

__all__ = ["TABLES", "bars", "load_events", "load_table", "load_tables"]
