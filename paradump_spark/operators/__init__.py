"""Operator layer.

``diff``          — parasync's full-outer diff + stats (J1/A2).
``dedup``         — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                    embedding near-dup deduplication.
``similarity``    — brute-force and IVF top-k embedding search.
``text_analysis`` — quality scoring, language-ID, fingerprints.
``multimodal``    — binary-payload plumbing with Arrow-batched extract.
"""
