"""Sequential pure-Python oracle mirroring the reference's control flow."""
