"""G15 — frequent subgraph mining over a labeled directed graph
[ScaleMine's namesake capability: enumerate all small patterns whose MNI
support clears a threshold, SC'16 §2; g5 computes the support of ONE
fixed pattern — this operator runs the actual mine over every size-1 and
size-2 pattern].

Pattern space (directed, node-injective embeddings, i.e. all pattern
nodes map to distinct graph vertices):

- ``edge``      u→v                    (l1=label(u), l2=label(v))
- ``path``      u→v→w, u≠w             (l1=label(u), l2=label(v), l3=label(w))
- ``out_star``  v→u, v→w, u≠w          (l1=label(v), l2≤l3 = leaf labels)
- ``in_star``   u→v, w→v, u≠w          (l1=label(v), l2≤l3 = leaf labels)

Support is MNI (minimum number of distinct graph vertices any pattern
node maps to across all embeddings), computed PER AUTOMORPHISM ORBIT:
a star whose two leaf labels are equal has one leaf orbit (the swap is
an automorphism), so its leaf image is the union of both roles — the
textbook MNI definition, which a per-role min would understate. A
directed path has a trivial automorphism group even when its end labels
match, so its roles stay separate.

Scale plan (100 TB): the naive support evaluation materializes every
embedding — Θ(Σ deg²) wedges, the quadratic mass that kills subgraph
miners on web graphs (a degree-10⁶ hub alone yields 10¹² wedges). This
operator never materializes a level-2 embedding. Each size-2 support is
derived from per-vertex LABEL-DEGREE PROFILES (vertex, label → count,
min-neighbor), O(E) rows, one shuffle each side:

- a center's qualification for a pattern is a predicate on two profile
  rows (counts ≥ 1/2, plus a min-neighbor inequality for the single-in/
  single-out x==z path corner where the only candidate endpoints
  coincide);
- an endpoint u is in the pattern's u-image iff its center has an
  alternative completion (count ≥ 2, or the single completion differs
  from u) — a predicate on the joined profile row, no pair enumeration.

Candidate patterns are Apriori-pruned first (MNI is anti-monotone:
restricting an embedding of P to a subpattern embeds the subpattern, so
every node image can only grow — hence support(P) ≤ support(sub-edge)):
edges whose (la, lb) pattern is below threshold are dropped by a
broadcast semi-join before any profile is built, exactly ScaleMine's
prune. The final per-pattern aggregation groups ≤ L³ rows (label-space
cubed), with the three COUNT(DISTINCT) columns expanding the profile
rows ×3 map-side — bounded by 3·E·L, linear in the graph.

The DuckDB oracle (queries.py g15) deliberately uses the NAIVE
embedding enumeration as the executable spec; the engine must match it
exactly, which is what the driver row verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _least3(a, b, c):
    return F.least(a, b, c)


def frequent_subgraphs(
    edges: DataFrame,
    labels: DataFrame,
    min_support: int,
    shapes: tuple[str, ...] = ("edge", "path", "out_star", "in_star"),
) -> DataFrame:
    """Mine all frequent size-1/size-2 patterns.

    edges: (src, dst) directed, assumed distinct with src != dst (the
    house edge contract — graph_edges guarantees both).
    labels: (id, lab int) one row per vertex.
    Returns (shape string, l1 int, l2 int, l3 int|null, support long),
    support >= min_support, ordered by (shape, l1, l2, l3).
    """
    tau = int(min_support)
    labeled = (
        edges.join(labels.select(F.col("id").alias("src"), F.col("lab").alias("la")), "src")
        .join(labels.select(F.col("id").alias("dst"), F.col("lab").alias("lb")), "dst")
        .select("src", "dst", "la", "lb")
    )

    # --- level 1: edge patterns -------------------------------------
    p1 = labeled.groupBy("la", "lb").agg(
        F.least(F.countDistinct("src"), F.countDistinct("dst")).alias("support")
    )
    f1 = p1.filter(F.col("support") >= tau)

    # Apriori prune: only edges whose own pattern is frequent can appear
    # in a frequent size-2 pattern (anti-monotonicity, module docstring).
    # f1 is <= L^2 rows — broadcast semi-join, no shuffle of `labeled`.
    fe = labeled.join(
        F.broadcast(f1.select("la", "lb")), ["la", "lb"], "left_semi"
    ).persist()

    out = f1.select(
        F.lit("edge").alias("shape"),
        F.col("la").alias("l1"),
        F.col("lb").alias("l2"),
        F.lit(None).cast("int").alias("l3"),
        F.col("support").cast("long").alias("support"),
    )

    if "path" in shapes:
        out = out.unionByName(_mine_paths(fe, tau))
    if "out_star" in shapes:
        out = out.unionByName(_mine_stars(fe, tau, direction="out"))
    if "in_star" in shapes:
        out = out.unionByName(_mine_stars(fe, tau, direction="in"))
    return out.orderBy("shape", "l1", "l2", "l3")


def _mine_paths(fe: DataFrame, tau: int) -> DataFrame:
    """Frequent u→v→w paths from in/out label-degree profiles of v."""
    din = fe.groupBy(
        F.col("dst").alias("v"), F.col("lb").alias("lv"), F.col("la").alias("x")
    ).agg(F.count("*").alias("cin"), F.min("src").alias("fu"))
    dout = fe.groupBy(
        F.col("src").alias("v"), F.col("la").alias("lv"), F.col("lb").alias("z")
    ).agg(F.count("*").alias("cout"), F.min("dst").alias("fw"))
    # qualification: some (u, w) with u != w exists. When x != z the
    # endpoint labels differ so u != w is automatic; when x == z it
    # fails only in the 1-in/1-out corner where both are the same node.
    qual = (
        din.join(dout, ["v", "lv"])
        .filter(
            (F.col("x") != F.col("z"))
            | (F.col("cin") >= 2)
            | (F.col("cout") >= 2)
            | (F.col("fu") != F.col("fw"))
        )
        .persist()
    )
    centers = qual.groupBy("x", "lv", "z").agg(F.countDistinct("v").alias("sv"))
    # u-image: u has a completion w != u iff cout >= 2 or the single
    # out-neighbor differs (automatic when labels differ).
    uj = fe.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("la").alias("x")
    ).join(qual.select("v", "lv", "x", "z", "cout", "fw"), ["v", "x"])
    su = (
        uj.filter((F.col("x") != F.col("z")) | (F.col("cout") >= 2) | (F.col("fw") != F.col("u")))
        .groupBy("x", "lv", "z")
        .agg(F.countDistinct("u").alias("su"))
    )
    wj = fe.select(
        F.col("src").alias("v"), F.col("dst").alias("w"), F.col("lb").alias("z")
    ).join(qual.select("v", "lv", "x", "z", "cin", "fu"), ["v", "z"])
    sw = (
        wj.filter((F.col("x") != F.col("z")) | (F.col("cin") >= 2) | (F.col("fu") != F.col("w")))
        .groupBy("x", "lv", "z")
        .agg(F.countDistinct("w").alias("sw"))
    )
    sup = (
        centers.join(su, ["x", "lv", "z"]).join(sw, ["x", "lv", "z"])
        .select(
            "x", "lv", "z",
            _least3(F.col("sv"), F.col("su"), F.col("sw")).alias("support"),
        )
        .filter(F.col("support") >= tau)
    )
    return sup.select(
        F.lit("path").alias("shape"),
        F.col("x").cast("int").alias("l1"),
        F.col("lv").cast("int").alias("l2"),
        F.col("z").cast("int").alias("l3"),
        F.col("support").cast("long").alias("support"),
    )


def _mine_stars(fe: DataFrame, tau: int, direction: str) -> DataFrame:
    """Frequent 2-leaf stars. direction='out': v→u, v→w; 'in': u→v, w→v.

    Leaf labels are reported sorted (l2 <= l3). Equal leaf labels form
    ONE automorphism orbit: the leaf image is the union of both roles.
    """
    if direction == "out":
        prof_src = fe.select(
            F.col("src").alias("v"), F.col("la").alias("lv"),
            F.col("dst").alias("leaf"), F.col("lb").alias("l"),
        )
        shape = "out_star"
    else:
        prof_src = fe.select(
            F.col("dst").alias("v"), F.col("lb").alias("lv"),
            F.col("src").alias("leaf"), F.col("la").alias("l"),
        )
        shape = "in_star"
    prof = prof_src.groupBy("v", "lv", "l").agg(F.count("*").alias("c")).persist()

    # distinct leaf labels (lx < ly): any pair of rows qualifies, and the
    # two leaves are distinct vertices because their labels differ.
    p = prof.select("v", "lv", F.col("l").alias("lx"))
    q = prof.select("v", "lv", F.col("l").alias("ly"))
    ne_keys = p.join(q, ["v", "lv"]).filter(F.col("lx") < F.col("ly")).persist()
    ne_centers = ne_keys.groupBy("lv", "lx", "ly").agg(F.countDistinct("v").alias("sv"))
    # ne_keys descends from prof_src through an agg, so grouping columns
    # keep their expression ids — alias both sides to disambiguate.
    ps, nk = prof_src.alias("ps"), ne_keys.alias("nk")
    lj = ps.join(
        nk, (F.col("ps.v") == F.col("nk.v"))
        & ((F.col("ps.l") == F.col("nk.lx")) | (F.col("ps.l") == F.col("nk.ly"))),
    ).select(
        F.col("nk.lv").alias("lv"), F.col("nk.lx").alias("lx"),
        F.col("nk.ly").alias("ly"), F.col("ps.l").alias("l"),
        F.col("ps.leaf").alias("leaf"),
    )
    ne_leaves = lj.groupBy("lv", "lx", "ly").agg(
        F.countDistinct(F.when(F.col("l") == F.col("lx"), F.col("leaf"))).alias("su"),
        F.countDistinct(F.when(F.col("l") == F.col("ly"), F.col("leaf"))).alias("sw"),
    )
    ne_sup = (
        ne_centers.join(ne_leaves, ["lv", "lx", "ly"])
        .select("lv", "lx", "ly", _least3(F.col("sv"), F.col("su"), F.col("sw")).alias("support"))
    )

    # equal leaf labels (lx == ly): the center needs >= 2 distinct
    # same-label neighbors (edges are distinct (src, dst) pairs, so
    # count >= 2 implies two distinct leaf vertices); one leaf orbit.
    eq_keys = prof.filter(F.col("c") >= 2).select("v", "lv", "l")
    eq_centers = eq_keys.groupBy("lv", "l").agg(F.countDistinct("v").alias("sv"))
    eq_lj = prof_src.join(eq_keys, ["v", "lv", "l"]).select("lv", "l", "leaf")
    eq_leaves = eq_lj.groupBy("lv", "l").agg(F.countDistinct("leaf").alias("sl"))
    eq_sup = (
        eq_centers.join(eq_leaves, ["lv", "l"])
        .select(
            "lv", F.col("l").alias("lx"), F.col("l").alias("ly"),
            F.least(F.col("sv"), F.col("sl")).alias("support"),
        )
    )

    return (
        ne_sup.unionByName(eq_sup)
        .filter(F.col("support") >= tau)
        .select(
            F.lit(shape).alias("shape"),
            F.col("lv").cast("int").alias("l1"),
            F.col("lx").cast("int").alias("l2"),
            F.col("ly").cast("int").alias("l3"),
            F.col("support").cast("long").alias("support"),
        )
    )
