"""RelationData: the engine's model of the reference's data abstractions.

Reference ([api], [upstream:src/RelationData.jl — UNVERIFIED]):
``Entity`` (a dimension, optionally with side-info features F),
``Relation`` (a sparse COO tensor over 2+ entities), ``RelationData``
(entities + relations sharing entities → collective factorization).

Engine: entities index DataFrames of factors; relations are long-format
COO DataFrames. The per-entity index the reference builds (IndexedDF) maps
to co-partitioning by entity id, not a data structure (SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Entity:
    """A named dimension. ``side_info`` is the Macau F matrix
    [paper:Macau], in either layout:

    - dense: ``(id, features: array<float>)`` — exploded to COO on load;
    - sparse COO at rest: ``(id, feat: long, v: double)`` — ingested
      directly, no dense detour (the 10⁵–10⁶-dim sparse-binary regime).
      ``side_dim`` pins the feature-space width when trailing feature ids
      are unobserved (defaults to max(feat)+1).
    """

    name: str
    side_info: DataFrame | None = None
    side_dim: int | None = None


@dataclass
class Relation:
    """Sparse observed relation in COO long format.

    ``df`` columns: one id column per entity (named by the entity), plus
    ``value_col``. Arity 2 = matrix, ≥3 = tensor. ``alpha`` is the noise
    precision [paper:Macau]; ``class_cut`` enables the binary/AUC readout
    [api]. ``probit=True`` additionally switches TRAINING to the binary
    likelihood: observations are binarized at class_cut and the Gibbs
    kernel runs on Albert–Chib truncated-normal latents z ~ TN(u·v, 1)
    (noise precision fixed at 1 — ``alpha`` is ignored), matching the
    reference's binary-relation training [api class_cut].

    ``alpha_sample=True`` samples the noise precision from its conjugate
    Gamma posterior each sweep instead of pinning it: α ~ Gamma(a0 + n/2,
    b0 + SSE/2) given the current factors' train residuals (the upstream
    API's adaptive-precision mode [api]; removes the main hand-tuned
    knob). ``alpha`` then only seeds the first sweep. Ignored for probit
    relations (their latent precision is 1 by construction).
    """

    df: DataFrame
    entities: list[str]
    value_col: str = "value"
    alpha: float = 2.0
    class_cut: float | None = None
    probit: bool = False
    alpha_sample: bool = False
    alpha_a0: float = 2.0  # Gamma prior shape
    alpha_b0: float = 1.0  # Gamma prior rate

    @property
    def arity(self) -> int:
        return len(self.entities)


@dataclass
class RelationData:
    """The 'database': entities + relations sharing them.

    Entities referenced by multiple relations get their sufficient
    statistics summed across relations in the Gibbs sweep — collective
    matrix factorization [api] [paper:Macau].
    """

    entities: dict[str, Entity] = field(default_factory=dict)
    relations: list[Relation] = field(default_factory=list)

    def add_entity(self, entity: Entity) -> "RelationData":
        self.entities[entity.name] = entity
        return self

    def add_relation(self, rel: Relation) -> "RelationData":
        for e in rel.entities:
            if e not in self.entities:
                self.entities[e] = Entity(e)
        self.relations.append(rel)
        return self

    def relations_of(self, entity: str) -> list[tuple["Relation", int]]:
        """All (relation, mode) pairs this entity participates in."""
        out = []
        for rel in self.relations:
            for mode, name in enumerate(rel.entities):
                if name == entity:
                    out.append((rel, mode))
        return out


def split_train_test(
    df: DataFrame, id_cols: list[str], test_frac: float = 0.2, seed: int = 42
) -> DataFrame:
    """Deterministic arithmetic cell split (SURVEY I1) — ``assignToTest!``
    [api] without rand(), so runs are reproducible and oracle-checkable.
    Adds a ``split`` column ('train'/'test')."""
    mod = 1_000_003  # prime
    cut = int(test_frac * mod)
    mix = F.lit(seed * 104_729 % mod).cast("long")
    # Per-column multipliers are successive modular POWERS of a seed-mixed
    # base — not multiples of one constant. Multiples (C·1, C·2, C·3 …)
    # collapse the bucket to C·Σ(k+1)·id_k mod p: for small dense id grids
    # (a tensor's index cube) that sum takes only ~Σdims distinct values, so
    # entire diagonal planes land in the same split and the holdout is
    # pathologically structured. Powers C, C², C³ are linearly independent
    # multipliers, so the map spreads a small grid across all of [0, p).
    base = (2_654_435_761 + seed * 40_503) % mod
    if base < 2:  # degenerate seed (base 0/1 ⇒ constant/affine-sum hash)
        base = 2_654_435_761 % mod
    for k, c in enumerate(id_cols):
        # pre-mod each id so products stay < 2^53: arbitrary int64 ids
        # (hashes, snowflake ids) would overflow ANSI int64 multiply
        reduced = F.pmod(F.col(c).cast("long"), F.lit(mod).cast("long"))
        mix = mix + reduced * F.lit(pow(base, k + 1, mod)).cast("long")
    bucket = F.pmod(mix, F.lit(mod).cast("long"))
    return df.withColumn("split", F.when(bucket < cut, "test").otherwise("train"))


def assign_to_test(
    df: DataFrame, id_cols: list[str], n: int, seed: int = 42
) -> DataFrame:
    """Hold out EXACTLY ``n`` cells — the reference's ``assignToTest!(rel,
    n)`` count form [api], next to the fraction form above.

    The ``n`` cells with the smallest seeded xxhash64 over the id columns
    become the test set: deterministic (same seed ⇒ same cells, any
    partitioning), uniform (hash order is independent of data order), and
    scale-safe — ``orderBy(...).limit(n)`` compiles to a per-partition
    top-n (TakeOrderedAndProject), never a full sort, and the n-row winner
    set broadcasts back onto the input. Id columns join the sort key so
    the selection stays total even under hash collisions.
    """
    h = F.xxhash64(*[F.col(c) for c in id_cols], F.lit(seed))
    winners = (
        # distinct: duplicate id tuples must not occupy several of the n
        # winner slots (and the broadcast join below would fan them out) —
        # exactly n DISTINCT cells are held out; duplicates of a held-out
        # cell all land in test together
        df.select(*id_cols)
        .distinct()
        .withColumn("__h", h)
        .orderBy("__h", *id_cols)
        .limit(n)
        .select(*id_cols, F.lit(1).alias("__is_test"))
    )
    out = df.join(F.broadcast(winners), on=id_cols, how="left")
    return out.withColumn(
        "split", F.when(F.col("__is_test").isNotNull(), "test").otherwise("train")
    ).drop("__is_test")
