"""Source/sink connectors (SURVEY §2.1)."""
