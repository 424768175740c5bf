"""Operator layer.

``diff``          — parasync's full-outer diff + stats (J1/A2).
``checksum``      — chunk checksums, two-phase incremental diff.
``profile``       — one-pass column profiles + mergeable HLL sketches.
``dedup``         — exact / MinHash-LSH (auto-tunable banding) /
                    SimHash / n-gram Jaccard + containment /
                    embedding near-dup / connected-components /
                    exact-substring-span / line-boilerplate dedup /
                    split-leakage audit.
``semdedup``      — SemDeDup semantic dedup (k-means blocking).
``fuzzyjoin``     — blocked fuzzy join / entity resolution.
``similarity``    — brute-force and IVF top-k embedding search.
``pq``            — product quantization (flat / IVFPQ, residual codes).
``decontam``      — benchmark decontamination (broadcast or Bloom).
``text_analysis`` — quality scoring, language-ID, fingerprints, TF-IDF,
                    per-source quality dashboard.
``quality_rules`` — Gopher rule set as pushdown expressions.
``pii``           — regex PII detection / redaction.
``classifier``    — hashed-feature linear quality classifier.
``lm``            — bigram-LM perplexity scoring + CCNet buckets.
``bpe``           — BPE vocabulary learning + subword tokenization.
``urls``          — URL features, domain blocklist, canonical-URL dedup.
``drift``         — PSI distribution-drift detection.
``ids``           — stable content-hash IDs + collision audit.
``sampling``      — deterministic splits, mixtures, group top-k.
``packing``       — FFD document packing + fixed-window sequence chunking.
``asof``          — as-of (point-in-time) join.
``rangejoin``     — bucketized range join.
``sessionize``    — gap sessionization.
``funnel``        — funnels, cohort retention, event transitions.
``props``         — JSON property extraction / field profiling.
``report``        — corpus datasheet / data-card JSON.
``multimodal``    — binary payloads: real image (PPM/BMP/PIL) and
                    audio (WAV/PCM) decode, features, resize, quarantine.
"""
