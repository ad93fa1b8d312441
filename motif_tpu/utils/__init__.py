"""Config, metrics, logging utilities (L7)."""
