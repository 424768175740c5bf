"""Sink layer — the reference's writer stages (K1–K6):

``files`` — SQL-insert text (K1), CSV (K2), zstd compression (K3),
            noop (K4), parquet (lake-native).
``dml``   — DB copy / DML apply via foreachPartition batched execute
            (K5/K6).
"""
