"""Source layer — the reference's scan stages:

``jdbc``     — live-DB introspection (S1/S2), partitioned chunk reads
               (S4/S5) via the JDBC ``predicates[]`` array, and the
               snapshot-consistency policy (S6).
``snapshot`` — S6 made real for MySQL: binlog-position-matched session
               pool (flush-lock + position-vote protocol) and the
               parallel consistent chunk exporter built on it.
"""
