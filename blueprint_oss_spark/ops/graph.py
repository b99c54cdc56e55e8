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
  * per-node state is `collect_set` of current neighbors — degrees
    shrink geometrically as stars collapse, and large-star moves the
    whole heavy tail of a skewed (giant-component) node directly onto
    the component min, so no single reducer accumulates the component;
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

  for _ in range(max_iter):
    # -- large-star: symmetric adjacency, larger neighbors -> min ------
    sym = e.select('src', 'dst').union(
        e.select(F.col('dst').alias('src'), F.col('src').alias('dst')))
    nb = sym.groupBy('src').agg(F.collect_set('dst').alias('nbrs'))
    m = F.array_min(F.array_union(F.col('nbrs'), F.array(F.col('src'))))
    large = (nb.select(F.col('src').alias('u'), F.col('nbrs'),
                       m.alias('m'))
             .select(F.explode(
                 F.filter('nbrs', lambda v: v > F.col('u'))).alias('src'),
                 F.col('m').alias('dst'))
             .where(F.col('src') != F.col('dst'))
             .distinct())
    # -- small-star: edges already oriented src > dst ------------------
    nb2 = large.groupBy('src').agg(F.collect_set('dst').alias('nbrs'))
    small = (nb2.select(F.col('src').alias('u'), F.col('nbrs'),
                        F.array_min('nbrs').alias('m'))
             .select(F.explode(
                 F.array_union(F.col('nbrs'), F.array(F.col('u'))))
                 .alias('src'),
                 F.col('m').alias('dst'))
             .where(F.col('src') != F.col('dst'))
             .distinct())
    new_e = small.localCheckpoint(eager=True)
    # set equality: both sides distinct, so equal counts + equal
    # union-distinct count <=> equal sets
    n_old, n_new = e.count(), new_e.count()
    if n_old == n_new and e.union(new_e).distinct().count() == n_new:
      e = new_e
      break
    e = new_e

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
