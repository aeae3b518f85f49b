"""Operator library: pure DataFrame -> DataFrame transforms."""
