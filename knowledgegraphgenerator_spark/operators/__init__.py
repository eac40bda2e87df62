"""KG pipeline stages as DataFrame -> DataFrame operators."""
