"""TPU-native vectorized query-execution engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the KNL
hash-join benchmark suite (xtcyclist/hash_join_codes_KNL, CIKM'17): NPJ / PHJ /
CPRA hash joins, radix partitioning and sort, hash aggregate, filter, and a
bit-compatible relation generator, scaled over TPU meshes via shard_map.
"""

__version__ = "0.1.0"
