"""Sources and sinks (S1–S12 of SURVEY §2.1)."""
