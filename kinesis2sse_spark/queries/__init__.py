"""Named, oracle-checked queries — one module per operator family.

Each module registers queries via ``kinesis2sse_spark.registry.register``.
"""
