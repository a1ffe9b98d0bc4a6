"""YAML rule → Spark Column compiler."""
