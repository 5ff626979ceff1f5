"""Engine layer: versioned storage (deltalite), metastore catalog,
statement router, and HTTP serving — the code seafowl itself implements
around DataFusion (reference src/context/, src/catalog/, src/frontend/),
re-expressed around Spark SQL.
"""
