"""Reusable relational operators, each designed around its shuffle:

- ``spine``      calendar completion (generated spine LEFT JOIN facts)
- ``impute``     per-group mean imputation via partition windows
- ``dedup``      keep-first dedup + near-dup families (minhash/simhash)
- ``windows``    last-per-group / lag idioms
- ``similarity`` vector similarity search (brute-force + LSH-bucketed)
"""
