"""Source/sink edges."""
