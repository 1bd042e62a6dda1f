"""External table-format connectors (gated on runtime availability)."""
