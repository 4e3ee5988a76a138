"""Column-expression and vectorized-pandas scalar functions (SURVEY §2.9)."""
