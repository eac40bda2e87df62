"""Input sources: FAQ parsers, synonym CSV, synthetic web-pages corpus."""
