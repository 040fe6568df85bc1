"""Placeholder — operators land in subsequent milestones."""
