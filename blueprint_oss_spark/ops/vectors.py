"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; an LSH-bucketed
variant (random hyperplane signs via deterministic hashing) as the scale
path.  Dot products run JVM-side via F.zip_with/F.aggregate — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
  return spark.read.parquet(f'{sf_dir}/embeddings.parquet')


def _dot(a, b):
  return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                     F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
  return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
  """Squared L2 norm per vector, computed in double, rounded for
  engine-stable comparison."""
  e = _emb(spark, sf_dir)
  vec = F.transform(F.col('embedding'), lambda x: x.cast('double'))
  return (e.select('vec_id', 'label',
                   F.round(_dot(vec, vec), 2).alias('norm_sq'))
          .orderBy('vec_id'))


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str, *,
                           query_vec_id: int = 0, k: int = 10) \
    -> DataFrame:
  """Exact cosine top-k neighbours of one query vector — broadcast the
  query, score every row map-side, take the global top-k.  The pattern
  scales: per-partition top-k then a tiny final merge (Spark's sort+limit
  does exactly this)."""
  e = _emb(spark, sf_dir)
  vec = F.transform(F.col('embedding'), lambda x: x.cast('double'))
  q = e.where(F.col('vec_id') == query_vec_id).select(
      F.col('vec_id').alias('q_id'), vec.alias('q'))
  scored = (e.crossJoin(F.broadcast(q))
            .where(F.col('vec_id') != F.col('q_id'))
            .select('vec_id',
                    (_dot(vec, F.col('q'))
                     / (_norm(vec) * _norm(F.col('q'))))
                    .alias('cosine')))
  return (scored
          .orderBy(F.desc(F.round('cosine', 6)), 'vec_id')
          .limit(k)
          .select('vec_id', F.round('cosine', 4).alias('cosine_r')))


def ann_lsh_buckets(spark: SparkSession, sf_dir: str, *,
                    n_planes: int = 8) -> DataFrame:
  """Sign-LSH bucketing: deterministic pseudo-random hyperplanes from
  xxhash64(dim, seed) weights; bucket = sign bits packed to a long.
  Neighbour candidates = same-bucket vectors; at scale the bucket id is
  the shuffle/bucketing key and queries only probe matching buckets."""
  e = _emb(spark, sf_dir)
  vec = F.transform(F.col('embedding'), lambda x: x.cast('double'))
  bits = []
  for p in range(n_planes):
    # weight_d = hash(d, p) mapped to [-1, 1); deterministic across
    # engines and runs
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.transform(F.sequence(F.lit(0), F.size(F.col('embedding'))
                                   - 1),
                        lambda d, p=p: (F.pmod(F.xxhash64(d, F.lit(p)),
                                               F.lit(2000)) - 1000)
                        / 1000.0),
            lambda x, w: x * w),
        F.lit(0.0), lambda acc, v: acc + v)
    bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
  bucket = bits[0]
  for b in bits[1:]:
    bucket = bucket + b
  return (e.select('vec_id', 'label', bucket.alias('bucket'))
          .orderBy('vec_id'))


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str, *,
                             threshold: float = 0.95,
                             block_planes: int = 4) -> DataFrame:
  """Embedding-cosine near-dup pairs above a threshold, LSH-blocked:
  candidate pairs share a sign-LSH bucket (block_planes bits), exact
  cosine inside the block.  The bucket id is the shuffle key — at scale
  this is one groupBy instead of a cross join."""
  buckets = ann_lsh_buckets(spark, sf_dir, n_planes=block_planes) \
      .select('vec_id', 'bucket')
  e = _emb(spark, sf_dir).join(buckets, 'vec_id')
  a = e.alias('a')
  b = e.alias('b')
  vec = lambda side: F.transform(F.col(f'{side}.embedding'),
                                 lambda x: x.cast('double'))
  pairs = (a.join(b, (F.col('a.bucket') == F.col('b.bucket'))
                  & (F.col('a.vec_id') < F.col('b.vec_id')))
           .select(F.col('a.vec_id').alias('vec_a'),
                   F.col('b.vec_id').alias('vec_b'),
                   (_dot(vec('a'), vec('b'))
                    / (_norm(vec('a')) * _norm(vec('b'))))
                   .alias('cosine')))
  return (pairs.where(F.col('cosine') >= threshold)
          .select('vec_a', 'vec_b', F.round('cosine', 4).alias('cos_r'))
          .orderBy('vec_a', 'vec_b'))


def ann_topk_lsh(spark: SparkSession, sf_dir: str, *,
                 query_vec_id: int = 0, k: int = 10,
                 n_planes: int = 6) -> DataFrame:
  """ANN top-k: probe only the query's LSH bucket, exact cosine within.
  Falls back to fewer results when the bucket is small (the recall/
  speed tradeoff is the point of the operator)."""
  buckets = ann_lsh_buckets(spark, sf_dir, n_planes=n_planes)
  e = _emb(spark, sf_dir).join(buckets.select('vec_id', 'bucket'),
                               'vec_id')
  qb = e.where(F.col('vec_id') == query_vec_id) \
      .select(F.col('bucket').alias('qbucket'))
  cand = e.join(F.broadcast(qb), F.col('bucket') == F.col('qbucket'))
  vec = F.transform(F.col('embedding'), lambda x: x.cast('double'))
  q = (_emb(spark, sf_dir).where(F.col('vec_id') == query_vec_id)
       .select(F.col('vec_id').alias('q_id'), vec.alias('q')))
  scored = (cand.crossJoin(F.broadcast(q))
            .where(F.col('vec_id') != F.col('q_id'))
            .select('vec_id',
                    (_dot(vec, F.col('q'))
                     / (_norm(vec) * _norm(F.col('q'))))
                    .alias('cosine')))
  return (scored.orderBy(F.desc(F.round('cosine', 6)), 'vec_id')
          .limit(k)
          .select('vec_id', F.round('cosine', 4).alias('cosine_r')))
