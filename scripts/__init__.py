"""Published sweep scripts + golden/repro utilities (importable for tests)."""
