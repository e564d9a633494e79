from .warehouse import build_warehouse, fact_sales  # noqa: F401
