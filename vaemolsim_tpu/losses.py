"""Loss functions — populated incrementally."""
