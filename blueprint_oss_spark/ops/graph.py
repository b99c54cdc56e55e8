"""Distributed graph helpers for dedup pipelines.

`connected_components` turns near-duplicate candidate PAIRS (from
minhash/LSH banding, exact n-gram Jaccard, or embedding blocking) into
dedup GROUPS — the step a keep-one-representative dedup actually needs.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), expressed as
DataFrame groupBy/agg rounds:

  * large-star: per node u over the SYMMETRIC adjacency, attach every
    strictly-larger neighbor v to m = min(N(u) ∪ {u});
  * small-star: per node u over edges oriented large→small, attach every
    smaller neighbor and u itself to m = min(N(u)).

Each round is one groupBy-shuffle over node ids; the edge set collapses
toward star graphs rooted at each component's minimum id in O(log n)
rounds.  The fixpoint edge set *is* the (node → component-min) map.

Scale notes (100 TB / 10^9-node regime):
  * NO per-node arrays: each star step is a min-aggregate plus a join
    back onto the edge list (never `collect_set`, which would
    materialize a hub node's entire neighborhood in one reducer row —
    a memory bomb on giant components).  The only per-key state is one
    running min; hub-key joins are plain shuffle joins that AQE's
    skew-join splitting handles;
  * large-star moves the whole heavy tail of a skewed node directly
    onto the component min, so components collapse in O(log n) rounds;
  * the driver loop is iterative by nature; `localCheckpoint` after
    every round truncates lineage so plan size stays O(1) in rounds
    (on a cluster use `checkpoint` to a reliable dir for fault
    tolerance — same call shape);
  * convergence is detected by set equality (distinct edge sets with
    equal counts and equal union count), two cheap count jobs per
    round on the already-checkpointed frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = 'src',
                         dst: str = 'dst', *,
                         max_iter: int = 30) -> DataFrame:
  """Connected components over an undirected edge list.

  Returns a DataFrame (node, component) mapping every node that appears
  in `edges` — including each component's minimum node, which maps to
  itself — to its component's minimum node id.  Nodes with no edges
  simply don't appear — callers left-join and coalesce to self.
  """
  e = (edges
       .select(F.least(F.col(src), F.col(dst)).alias('dst'),
               F.greatest(F.col(src), F.col(dst)).alias('src'))
       .where(F.col('src') != F.col('dst'))
       .distinct()
       .localCheckpoint(eager=True))
  n_old = None  # lazily counted; carried across rounds (new == next old)

  for _ in range(max_iter):
    # -- large-star: symmetric adjacency, larger neighbors -> min ------
    # m(u) = min(N(u) ∪ {u}) via a plain min-aggregate; emit (v, m(u))
    # for every neighbor v > u by joining the mins back onto the edges.
    sym = e.select('src', 'dst').union(
        e.select(F.col('dst').alias('src'), F.col('src').alias('dst')))
    mins = (sym.groupBy('src')
            .agg(F.min('dst').alias('_mn'))
            .select('src', F.least('_mn', F.col('src')).alias('m')))
    large = (sym.join(mins, 'src')
             .where(F.col('dst') > F.col('src'))
             .select(F.col('dst').alias('src'), F.col('m').alias('dst'))
             .where(F.col('src') != F.col('dst'))
             .distinct())
    # -- small-star: edges already oriented src > dst ------------------
    # m(u) = min over u's smaller neighbors; emit (v, m) for every
    # v ∈ N(u) ∪ {u} except m itself.
    mins2 = large.groupBy('src').agg(F.min('dst').alias('m'))
    small_nbrs = (large.join(mins2, 'src')
                  .select(F.col('dst').alias('src'),
                          F.col('m').alias('dst')))
    small_self = mins2.select('src', F.col('m').alias('dst'))
    small = (small_nbrs.union(small_self)
             .where(F.col('src') != F.col('dst'))
             .distinct())
    new_e = small.localCheckpoint(eager=True)
    # set equality: both sides distinct, so equal counts + equal
    # union-distinct count <=> equal sets.  The old count is carried
    # from the previous round (counting a checkpointed frame twice
    # would burn one fixed-overhead job per round for nothing).
    if n_old is None:
      n_old = e.count()
    n_new = new_e.count()
    if n_old == n_new and e.union(new_e).distinct().count() == n_new:
      e = new_e
      break
    e, n_old = new_e, n_new

  members = e.select(F.col('src').alias('node'),
                     F.col('dst').alias('component'))
  # at the fixpoint every dst IS a component min; give roots a
  # self-row so the mapping covers all nodes in the edge list
  roots = e.select(F.col('dst').alias('node'),
                   F.col('dst').alias('component')).distinct()
  # min-agg instead of dropDuplicates: deterministic even if max_iter
  # cut the loop before the sets became disjoint
  return (members.unionByName(roots)
          .groupBy('node').agg(F.min('component').alias('component')))
