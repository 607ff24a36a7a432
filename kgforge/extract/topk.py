"""Train-time top-k count strategies (reference re_model.py:282-342) —
the per-sentence candidate-budget curriculum, re-expressed as ONE
engine-portable SQL template per strategy.

The reference trains its relation head on the first ``count`` entries
of each sentence's gold-sorted draft pair list
(entity_pair_filter.py:356-401); ``count`` is picked by one of 18 named
strategies (dated config codes) mixing five per-sentence statistics
with the filter's RUNNING train recall ``r``:

  ec  entity count                       len(entity)
  g   draft pair count (the list cap)    G = len(gold_draft_ent_groups)
  pc  pairs scoring  > gamma (0.5)       pred_count
  vp  pairs scoring  > 1e-4              val_pos_count
  lg  pairs with a non-NA gold relation  labels_gold_count

At query-engine scale this is a CURRICULUM REPLAY operator: given a
scored pair table and a recorded recall checkpoint ``r`` (a replay
parameter — the live value only exists mid-training), compute every
strategy's per-sentence budget and the truncation it implies.  Each
formula is written ONCE as a SQL template evaluated by BOTH engines
(Spark via F.expr, DuckDB verbatim in the oracle), so cross-engine
parity is structural, not re-derived.

Numeric faithfulness notes: Python ``int()`` on these non-negative
expressions is floor -> CAST(FLOOR(..) AS BIGINT); ``np.ceil`` ->
CAST(CEIL(..) AS BIGINT); integer '/' promotes to double in Python 3,
Spark SQL and DuckDB alike; all count inputs are BIGINT so
GREATEST/LEAST type-resolve identically.  The reference consumes the
budget as a list slice, so the EFFECTIVE kept count is
``LEAST(GREATEST(count, 0), g)`` — exposed separately (several
strategies can exceed g or, at high recall, go negative before the
max-with-0 the slice implies).
"""

from __future__ import annotations

GAMMA = 0.5  # use_thres_gamma default (re_model.py:288)
VAL_THRESHOLD = 1e-4  # use_thres_threshold default (re_model.py:295)
REPLAY_RECALL = 0.8  # replay checkpoint for the running train recall

_FLOOR = "CAST(FLOOR({x}) AS BIGINT)"
_CEIL = "CAST(CEIL({x}) AS BIGINT)"


def _f(x: str) -> str:
    return _FLOOR.format(x=x)


def _c(x: str) -> str:
    return _CEIL.format(x=x)


# the shared second operand: int(G - G*r + pred_count*r*K)
def _base(k: int) -> str:
    return _f(f"g - g * {{r}} + pc * {{r}} * {k}") if k != 1 else _f(
        "g - g * {r} + pc * {r}"
    )


# one SQL template per strategy, verbatim arithmetic from
# re_model.py:297-342 ('default' = the else branch at :341)
STRATEGY_SQL: dict[str, str] = {
    "0903": f"GREATEST({_c('ec * (1 - {r})')}, {_base(2)})",
    "0927": f"GREATEST(ec, {_base(2)})",
    "0928": f"GREATEST({_c('ec * (1 - {r} / 2)')} + 1, {_base(2)})",
    "1007": f"GREATEST({_c('ec * (1 - {r} / 2)')}, {_base(1)})",
    "1008": f"GREATEST(CAST(0 AS BIGINT), {_base(2)})",
    "1017": f"GREATEST(vp, {_base(2)})",
    "1028": f"GREATEST(vp, {_base(1)})",
    "1029": f"LEAST({_c('vp * (3 - 2 * {r})')}, g)",
    "1030": f"LEAST({_c('vp * (3 - 2 * POWER({r}, 0.2))')}, g)",
    "1033": f"LEAST({_c('vp * (3 - POWER({r}, 0.1)) / 2')}, g)",
    "1034": f"LEAST({_c('lg * (3 - POWER({r}, 0.1))')}, g)",
    "1036": f"LEAST({_c('lg * (3 - POWER({r}, 0.5))')}, g)",
    "1035": "lg * 2",
    "11042": "lg * 2 + 1",
    "11044": "lg * 4 + 1",
    "11046": "lg * 6 + 1",
    "1109": f"GREATEST({_f('ec / 2')}, {_base(1)})",
    "1130": f"GREATEST(CAST(5 AS BIGINT), {_base(1)})",
    "default": f"GREATEST(ec, {_base(1)})",
}


def strategy_count_sql(name: str, r: float = REPLAY_RECALL) -> str:
    """The strategy's budget as a SQL expression over columns
    (ec, g, pc, vp, lg) — valid in Spark SQL and DuckDB alike."""
    return STRATEGY_SQL[name].format(r=repr(float(r)))


def kept_sql(count_expr: str) -> str:
    """Effective kept pairs the reference's list slice implies."""
    return f"LEAST(GREATEST({count_expr}, CAST(0 AS BIGINT)), g)"
