"""Shared deterministic-sketch parameters.

Deterministic cross-engine HLL: m=64 registers, p=6, md5-derived
48-bit hash (the hash48 primitive), rho = leading zeros of the
42-bit suffix + 1 (<= 43). Sum of 2^-M_j is a sum of dyadic
rationals with granularity >= 2^-43 and magnitude <= 64 — every
partial sum fits 49 mantissa bits, so DOUBLE addition is exact and
ORDER-FREE in both engines, making the whole estimate (one final
multiply/divide on identical operands) bit-identical without any
decimal detour. alpha_64 = 0.709 (Flajolet et al. 2007).

Lives here (not in a queries_* module) because two query modules
share it and the queries_* modules must stay import-order-free:
queries.py's bottom imports run in a fixed order, but ANY of them can
also be a user's first import target, which re-enters queries.py and
would hit a partially-initialized sibling (the re-entrant path
test_smoke_all_queries pins).
"""

HLL_M = 64
HLL_RHO_MAX = 43
HLL_ALPHA = 0.709
