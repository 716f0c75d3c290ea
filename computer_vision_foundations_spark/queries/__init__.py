"""Query registry package — split by slice from the former single-file
queries.py (round 5; no behavior change). `common` holds the registry
dicts and `_register`; the part modules register entries on import;
finalization below sorts the dicts so insertion order == numeric order.
"""

from computer_vision_foundations_spark.queries.common import (  # noqa: F401
    QuerySpec,
    _ORACLES,
    _QUERIES,
    _register,
    load_table,
    oracle_sql,
    queries,
)
from computer_vision_foundations_spark.queries import (  # noqa: F401
    part_a,
    part_b,
    part_c,
    part_d,
    part_e,
)



# ---------------------------------------------------------------------------
# Registry finalization
# ---------------------------------------------------------------------------
# The driver's correctness gate records at most the first 50 registry
# entries, so slot order is part of the contract. Round 3 renumbered the
# registry (see README "Registry numbering") to pull every operator
# family that had only local verification (PQ, IVF-PQ, mixture,
# decontamination, vocab/PMI, chunk/pack/redact, SimHash pairing, fuzzy,
# z-order, UDTF, percentile/JSON/HOF relational) into q01–q50, demoting
# long-driver-green simple relational entries and the three rows-only
# sampling/image entries to q51+. Sorting here makes dict insertion
# order == numeric order, so the "first 50" are the same set whether the
# driver iterates insertion order or sorts keys.
# dict.update of existing keys keeps old positions — rebuild instead
_sorted_q = dict(sorted(_QUERIES.items()))
_QUERIES.clear()
_QUERIES.update(_sorted_q)
_sorted_o = dict(sorted(_ORACLES.items()))
_ORACLES.clear()
_ORACLES.update(_sorted_o)
