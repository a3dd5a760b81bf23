"""Placeholder — queries added in later milestones."""
