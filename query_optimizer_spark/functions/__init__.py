"""Large-scale data-pipeline operators (beyond the reference's surface).

Design rules (SURVEY.md 'beyond the reference' mandate; 100 TB scale):

- Everything is built from JVM-side ``pyspark.sql.functions`` -- no
  row-at-a-time Python in any hot path; Pandas UDFs only where built-ins
  genuinely can't express the op (multimodal decode).
- Candidate generation is always *blocked* (LSH bands, shared-shingle
  joins, signature bytes), never an unblocked cross join, so each op's
  shuffle volume stays proportional to data + collisions.
- Every op is deterministic and has a DuckDB oracle generated from the
  SAME constants (hash seeds, permutation coefficients, thresholds), so
  the driver's value-hash gate can verify it bit-for-bit: all hashing is
  md5-derived integers and all similarity math is integer-quantized
  before any floating-point division.
"""
