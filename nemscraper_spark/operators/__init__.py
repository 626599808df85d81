"""Custom operators that exceed declarative DataFrame algebra.

Only a handful exist by design (SURVEY.md §2.10): everything else in the
engine is built-in Catalyst operators. Each module documents its
at-scale execution strategy.
"""
