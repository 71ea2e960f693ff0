package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data EXPORT operators: the last mile between a cleaned corpus
  * and what a pretraining job actually reads — a deterministically
  * shuffled, evenly sharded, sequence-packed layout.
  *
  * Both ops are seeded and replayable: the "randomness" is md5 over
  * `"<seed>:<id>"`, so a re-run (or an independent engine — the DuckDB
  * oracles replay the exact same bytes) produces the identical layout,
  * and a task retry can never scramble the order the training job sees.
  */
object Export {

  /** md5-derived 60-bit pseudo-random key for `"<seed>:<id>"` — the
    * deterministic stand-in for a random draw, replayable cross-engine
    * (`CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)` in DuckDB). */
  private def md5Key60(idCol: String, seed: Long) =
    conv(substring(md5(concat(lit(s"$seed:"),
      col(idCol).cast("string")).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic seeded corpus shuffle + shard assignment: adds
    * `shard` (0..numShards-1) and `pos` (0-based write position within
    * the shard) such that reading shards round-robin replays the global
    * shuffled order. Training pipelines need exactly this before export:
    * document order decorrelated from ingestion order (no
    * crawl-locality / time-locality runs in a training batch), split
    * into evenly sized shards.
    *
    * Scale shape: ONE range exchange — the sort by the md5 key IS the
    * shuffle product — and the global rank comes from
    * [[Ops.globalRowNumber]] (partition-ordinal bit-split + broadcast
    * offsets), not a single-task window. Round-robin on the rank makes
    * shard sizes differ by at most 1 doc (a hash-mod shard has binomial
    * skew instead), and `pos` is already the within-shard write order:
    * `df.write.partitionBy("shard")` after a `repartition(shard) +
    * sortWithinPartitions(pos)` lays files out exactly as the training
    * job reads them. */
  def shuffleShards(df: DataFrame, idCol: String, seed: Long,
                    numShards: Int): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val ranked = Ops.globalRowNumber(
      df.withColumn("_sk", md5Key60(idCol, seed)),
      Seq(col("_sk"), col(idCol)), "_rank")
    ranked
      .withColumn("shard", (col("_rank") - 1) % numShards)
      .withColumn("pos", floor((col("_rank") - 1) / numShards).cast("long"))
      .drop("_sk", "_rank")
  }

  /** Token-budget head selection: keep the best documents — by
    * (`scoreCol` desc, id asc), a total order — whose INCLUSIVE running
    * token sum stays within `budget`. The "give me the top N tokens of
    * the corpus by quality" step that sizes a training mix; emits
    * `cum_tokens` (the running total through this doc) alongside the
    * caller's columns.
    *
    * Scale shape: a global running sum is ordinarily a single-task
    * window (`ORDER BY` with no partition) — the classic 100 TB
    * bottleneck. This is instead the [[Ops.globalRowNumber]] recipe
    * generalized from counts to weighted sums: ONE pinned-count range
    * exchange on the sort key, per-partition token TOTALS aggregated
    * from the persisted sorted frame (#partitions rows), their running
    * offsets a tiny single-task window, broadcast back, and the
    * within-partition running sum folded sequentially per partition
    * (order is the in-partition sort order — deterministic under retry
    * because the sort key is total and the frame is persisted, so the
    * partition-id bits in `_mid` are data, not recomputation). Project
    * narrow columns (id, tokens, score) before calling at scale — the
    * range exchange carries every column you pass. */
  def takeTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
                      scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val spark = df.sparkSession
    val parts = math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val ord = Seq(col(scoreCol).desc, col(idCol).asc)
    // Pinned partition count + persist + pid-from-_mid-as-data: the same
    // correctness triad as globalRowNumber (see the graveyard notes there —
    // sibling-branch range exchanges do NOT bucket identically).
    val ranked = df.repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sums = ranked
      .groupBy(shiftrightunsigned(col("_mid"), 33).as("_pid"))
      .agg(sum(col(tokensCol)).as("_ptok"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = sums.select(col("_pid"),
      coalesce(sum(col("_ptok")).over(w), lit(0L)).as("_off"))
    val joined = ranked
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33))
      .join(broadcast(offsets), Seq("_pid"), "left")
      .withColumn("_off", coalesce(col("_off"),
        raise_error(concat(lit("takeTokenBudget: no offset for partition "),
          col("_pid").cast("string"))).cast("long")))
    val outSchema = joined.drop("_pid", "_mid", "_off").schema
      .add("cum_tokens", LongType)
    val tokIdx = joined.schema.fieldIndex(tokensCol)
    val offIdx = joined.schema.fieldIndex("_off")
    val dropIdx = Set(joined.schema.fieldIndex("_pid"),
      joined.schema.fieldIndex("_mid"), offIdx)
    joined.mapPartitions { rows =>
      // Rows arrive in the in-partition sort order (broadcast join and
      // projections are narrow); every row of a partition carries the same
      // _off. The inclusive running sum crosses `budget` exactly once, so
      // the tail is dropped here — only the kept prefix leaves the task.
      var cum = -1L
      rows.flatMap { r =>
        if (cum == -1L) cum = r.getLong(offIdx)
        cum += r.getLong(tokIdx)
        if (cum <= budget)
          Some(Row.fromSeq(r.toSeq.zipWithIndex
            .collect { case (v, i) if !dropIdx(i) => v } :+ cum))
        else None
      }
    }(Encoders.row(outSchema))
  }

  /** Greedy sequence packing: assign each document to a training
    * sequence of at most `capacity` tokens — the packing step every
    * pretraining pipeline runs so short documents don't waste context
    * window. Documents are dealt to `numShards` shards by seeded md5
    * hash, then packed first-fit IN ID ORDER within each shard: a new
    * sequence starts whenever the running fill would exceed `capacity`
    * (a document longer than `capacity` gets a sequence of its own).
    * Adds `shard`, `seq` (0-based within shard) and `seq_offset` (token
    * offset of this doc inside its sequence). Downstream, the actual
    * packed rows are a `groupBy(shard, seq)` concat ordered by
    * `seq_offset`.
    *
    * Scale shape: the only exchange is the hash shuffle on `shard`, and
    * it carries whatever the caller projected — pass (id, tokens) and
    * join the assignment back by id rather than shuffling text. The
    * first-fit fold is inherently sequential PER SHARD (each bin
    * boundary depends on every prior doc in the shard — not a window,
    * a recursion), so parallelism = numShards: pick it at least the
    * cluster's core count and each task folds O(corpus/numShards) rows
    * with zero driver involvement. Determinism under retry: shard
    * contents are a pure hash partition and the in-partition sort is by
    * (shard, id) — a total order — so recomputed tasks rebuild byte-
    * identical packings. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    capacity: Long, numShards: Int,
                    seed: Long = 42L): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    require(numShards >= 1, "numShards must be >= 1")
    val pre = df
      .withColumn("shard", pmod(md5Key60(idCol, seed), lit(numShards.toLong)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
    val outSchema = pre.schema.add("seq", LongType).add("seq_offset", LongType)
    val shardIdx = pre.schema.fieldIndex("shard")
    val tokIdx = pre.schema.fieldIndex(tokensCol)
    pre.mapPartitions { rows =>
      // One partition may hold several shards (hash-partitioned); rows
      // arrive sorted by (shard, id), so a shard change resets the fold.
      var curShard = -1L
      var fill = 0L
      var seq = -1L
      rows.map { r =>
        val shard = r.getLong(shardIdx)
        val tok = r.getLong(tokIdx)
        if (shard != curShard) { curShard = shard; seq = 0L; fill = tok }
        else if (fill + tok > capacity) { seq += 1L; fill = tok }
        else fill += tok
        Row.fromSeq(r.toSeq :+ seq :+ (fill - tok))
      }
    }(Encoders.row(outSchema))
  }

  /** Word-level vocabulary encoding — the tokenize-to-ids step of the
    * export path: build the corpus vocabulary (the `vocabSize` most
    * frequent tokens, ties broken lexically — a deterministic total
    * order), assign ids 0..V−1 in rank order, and map every other token
    * to a stable OOV id V + (md5-60(token) mod `oovBuckets`) (the hashing
    *-trick fallback, so rare tokens stay distinguishable without an
    * unbounded vocab). Output: the id column, `n_toks`, and `input_ids`
    * (array<long> in original token order; empty for token-less docs).
    *
    * Scale shape: vocabulary selection is the salted two-phase top-k
    * ([[Sampling.topKPerStratum]] with one stratum) — a web-scale
    * distinct-token table never sorts in a single task; only the V
    * survivors (dim-sized by the caller's choice of V) pay the final
    * rank window, and the finished vocab is broadcast into the encode
    * pass, which is one corpus scan: posexplode keeps the position,
    * the per-doc array rebuild is an in-place sort_array(collect_list)
    * after the id repartition — token rows never shuffle. */
  def vocabEncode(docs: DataFrame, idCol: String, textCol: String,
                  vocabSize: Int, oovBuckets: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(oovBuckets >= 1, "oovBuckets must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("_tok"))
      .where(col("_tok") =!= "")
      .groupBy(col("_tok")).agg(count(lit(1)).as("_c"))
      .withColumn("_one", lit(1))
    val topV = Sampling.topKPerStratum(counts, "_one", "_tok", vocabSize,
      Seq(col("_c").desc))
    val vocab = topV
      .withColumn("_tid",
        row_number().over(Window.partitionBy(col("_one"))
          .orderBy(col("_c").desc, col("_tok"))).cast("long") - 1L)
      .select(col("_tok"), col("_tid"))
    val enc = docs.repartition(col(idCol))
      .select(col(idCol),
        posexplode_outer(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("_p", "_tok")))
      .withColumn("_tok",
        when(col("_tok") === "", lit(null: String)).otherwise(col("_tok")))
      .join(broadcast(vocab), Seq("_tok"), "left")
      .withColumn("_id", when(col("_tok").isNull, lit(null: java.lang.Long))
        .otherwise(coalesce(col("_tid"),
          lit(vocabSize.toLong) + pmod(Dedup.md5Hash60(col("_tok")),
            lit(oovBuckets.toLong)))))
    enc.groupBy(col(idCol))
      .agg(count(col("_tok")).as("n_toks"),
        transform(
          sort_array(collect_list(
            when(col("_id").isNotNull, struct(col("_p"), col("_id"))))),
          s => s.getField("_id")).as("input_ids"))
  }
}
