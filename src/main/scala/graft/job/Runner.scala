package graft.job

import graft.core.SchemaCasts
import graft.sink.{PartitionedParquetSink, Sink, WriteMode}
import graft.sources.{ConfigSources, Tables}
import graft.views.{Ressarcimento, SuperDesconto}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.time.LocalDate

/** C14 / EP1 / EP2 orchestration (reference `etl_job.py:28-130`), as pure
  * functions of a clock parameter so the period math and gates are testable.
  */
object Runner {

  final case class Period(start: LocalDate, end: LocalDate)

  /** Daily window (`etl_job.py:121-125`): start = first day of the current
    * month, shifted one month back while the month is ≤ 5 days old. */
  def period(today: LocalDate): Period = {
    val firstOfMonth = today.withDayOfMonth(1)
    val start = if (today.getDayOfMonth <= 5) firstOfMonth.minusMonths(1) else firstOfMonth
    Period(start, today)
  }

  /** Day-gate (`etl_job.py:89-91`): ressarcimento refreshes on days 1-5. */
  def ressarcimentoDue(today: LocalDate): Boolean = today.getDayOfMonth <= 5

  /** Year loop (`etl_job.py:95`): every year since `firstYear`, inclusive. */
  def ressarcimentoYears(today: LocalDate, firstYear: Int = 2023): Seq[Int] =
    firstYear to today.getYear

  /** The daily flagship view for `today`'s period — day-range scans of
    * both POS feeds, the broadcast join (`etl_job.py:28-85`); shared by
    * the mutable-sink and snapshot publishing paths so the two can never
    * drift in WHAT they compute, only in how the result is stored. */
  private def dailyFlagship(spark: SparkSession, config: Map[String, String],
                            today: LocalDate): DataFrame = {
    val Period(start, end) = period(today)
    val cosmosFeed = Tables.dayRangeScan(spark, config("bucket"), config("cosmos_system"), start, end)
    val preVendaFeed = Tables.dayRangeScan(spark, config("bucket"), config("pre_venda_system"), start, end)
    val cupom = SuperDesconto.cupom(cosmosFeed, preVendaFeed)
    val autorizador = SuperDesconto.autorizador(Tables.pathScan(spark, config("autorizacao")))
    val produto = SuperDesconto.produto(Tables.pathScan(spark, config("produto")))
    SuperDesconto.flagship(cupom, autorizador, produto)
  }

  /** EP1: the daily flagship — keyed upsert on `etiqueta` into a mutable
    * sink (`etl_job.py:28-85`). */
  def runDaily(spark: SparkSession, config: Map[String, String], sink: Sink,
               today: LocalDate): Long =
    sink.mergeByKey(dailyFlagship(spark, config, today), Seq("etiqueta"))

  /** EP1 with time travel: the same daily MERGE published as a NEW
    * [[SnapshotStore]] version per run — the Pipeline A twin of
    * [[runRessarcimentoSnapshot]] (Pipeline B got snapshots first; the
    * daily job wrote in place, so "what did the flagship table hold
    * before this morning's merge" had no answer). `commitMerge` carries
    * unmatched prior keys forward and replaces matched ones, exactly the
    * mutable path's MERGE semantic, so the HEAD always equals what
    * [[runDaily]] into a [[graft.sink.ParquetSink]] would contain — with
    * every previous day still readable at its version and a bad feed one
    * `rollback` away. Returns the committed version. */
  def runDailySnapshot(spark: SparkSession, config: Map[String, String],
                       store: graft.sink.SnapshotStore, today: LocalDate): Long =
    store.commitMerge(dailyFlagship(spark, config, today), Seq("etiqueta"))

  /** EP2: the monthly ressarcimento refresh — one job per year since 2023,
    * replace on the first WRITTEN year then append, skipping empty years
    * (`etl_job.py:89-114`). Returns rows written per year.
    *
    * Documented deviation: the reference ties Replace to the literal first
    * year (2023); if that year's view were empty, every later year would
    * append onto the PREVIOUS run's rows — up to 5 duplicate copies per
    * month under the day-1-to-5 gate. Replace-on-first-written keeps the
    * refresh idempotent regardless of which years are empty. */
  /** Shared EP2 year-loop plumbing: per year, build the main view (diamond
    * intermediates tracked so exactly these — not the whole session cache —
    * are freed once the year completes), probe emptiness on the CACHED
    * frame (without the persist, isEmpty would run the whole year plan
    * twice), and delegate the write decision. `handle` receives None for
    * an empty year and its returned count lands in the result map. */
  private def yearLoop(spark: SparkSession, config: Map[String, String], years: Seq[Int])(
      handle: (Int, Option[DataFrame]) => Option[Long]): Map[Int, Long] = {
    val sources = ConfigSources.ressarcimento(spark, config)
    // The supplier view has no year input — build and persist it ONCE for
    // the whole refresh instead of once per year (the default loop runs
    // every year since 2023: rebuilding it per year is years-1 redundant
    // scans of the fornecedor/aporte sources each month).
    val fornV = Ressarcimento.fornecedores(
      sources.forn, sources.aporteCab, sources.aporteDet, sources.dimProduto)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      years.flatMap { year =>
        val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
        val df: DataFrame = SchemaCasts.castDecimalDouble(
          Ressarcimento.mainView(sources, year, track = persisted, fornView = fornV))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persisted += df
        // The reference writes nothing for an empty year (etl_job.py:102-114).
        // Cleanup in finally: a failed write must not leak the year's cached
        // frames into a caller's retry loop.
        try {
          val written = handle(year, if (df.isEmpty) None else Some(df))
          written.map(year -> _)
        } finally persisted.foreach(_.unpersist(blocking = false))
      }.toMap
    } finally fornV.unpersist(blocking = false)
  }

  def runRessarcimento(spark: SparkSession, config: Map[String, String], sink: Sink,
                       today: LocalDate, firstYear: Int = 2023): Map[Int, Long] = {
    // The replace-on-first-written sequencing below is only correct for
    // WHOLE-TABLE Replace semantics: against a partition-scoped sink the
    // first Replace would touch one year's partition, leaving every other
    // year's previous rows to be APPENDED onto — up to 5 duplicate copies
    // per month under the day-1-to-5 gate. That sink has its own entry
    // point; reject the miswiring instead of silently duplicating.
    require(!sink.isInstanceOf[PartitionedParquetSink],
      "runRessarcimento's replace-then-append sequencing assumes whole-table " +
        "Replace; use runRessarcimentoPartitioned for a partition-scoped sink")
    if (!ressarcimentoDue(today)) return Map.empty
    var replaced = false
    val written = yearLoop(spark, config, ressarcimentoYears(today, firstYear)) {
      case (_, Some(df)) =>
        val mode = if (!replaced) { replaced = true; WriteMode.Replace } else WriteMode.Append
        Some(sink.write(df, mode))
      case (_, None) => None
    }
    // EVERY year empty → no Replace ever ran and last refresh's rows would
    // serve forever (the partitioned path deletes stale partitions for
    // exactly this case). Rebuild-from-scratch semantics require the table
    // to become empty: write a schema-bearing empty frame (limit 0 folds
    // to an empty relation at plan time — no source scan).
    if (written.isEmpty) {
      val empty = SchemaCasts.castDecimalDouble(Ressarcimento.mainView(
        ConfigSources.ressarcimento(spark, config), firstYear, reuse = false)).limit(0)
      sink.write(empty, WriteMode.Replace)
    }
    written
  }

  /** EP2 at scale: the year loop against a PARTITION-scoped sink — each
    * year is written as `Replace` of its own `ano=<year>` partition
    * (dynamic partition overwrite), so any single year can be re-run alone,
    * in any order, without touching the others. This removes
    * [[runRessarcimento]]'s replace-on-first-written sequencing, which
    * exists only because a whole-table Replace would drop the other years.
    *
    * A year whose refreshed view comes back EMPTY has its partition
    * DELETED (the whole-table path rebuilds from scratch so empty years
    * vanish naturally; a partition-scoped dynamic overwrite with zero rows
    * touches nothing, which would leave the stale rows serving forever).
    * Deleted years don't appear in the returned map, same as the
    * whole-table path's skipped years.
    *
    * `years` narrows the refresh (e.g. re-run just 2024 after a source
    * correction). An explicit `years` BYPASSES the day-1-to-5 due gate:
    * the override exists precisely for targeted mid-month re-runs, and
    * gating it would silently return Map.empty and leave the stale
    * partition serving. Default = the reference's gated
    * every-year-since-firstYear loop.
    */
  def runRessarcimentoPartitioned(spark: SparkSession, config: Map[String, String],
                                  sink: PartitionedParquetSink, today: LocalDate,
                                  firstYear: Int = 2023,
                                  years: Option[Seq[Int]] = None): Map[Int, Long] = {
    if (years.isEmpty && !ressarcimentoDue(today)) return Map.empty
    yearLoop(spark, config, years.getOrElse(ressarcimentoYears(today, firstYear))) {
      case (year, Some(df)) =>
        Some(sink.write(
          df.withColumn(sink.partitionCol, org.apache.spark.sql.functions.lit(year)),
          WriteMode.Replace))
      case (year, None) =>
        sink.deletePartition(year)
        None
    }
  }

  /** EP2 with time travel: the year loop publishing into a
    * [[SnapshotStore]]. Each year's refresh commits a NEW snapshot
    * version that replaces only that year's rows
    * ([[SnapshotStore.commitReplacePartitions]] on the stamped `ano`
    * column) — the snapshot twin of [[runRessarcimentoPartitioned]],
    * with every previous refresh still readable at its version: a bad
    * source drop is one `rollback` away, and "what did 2024 hold before
    * this month's refresh" is a `read(v-1)`. An EMPTY year commits a
    * version WITHOUT that year's rows (delete-with-history, mirroring
    * `deletePartition`) unless the store has no versions yet, in which
    * case there is nothing to delete and no version is burned.
    *
    * Returns year -> committed version (NOT row counts — the version is
    * the handle a snapshot consumer needs; row counts belong to the
    * mutable-sink paths). As in the partitioned path, an explicit
    * `years` override bypasses the day-1-to-5 due gate: the override
    * exists for targeted re-runs. */
  def runRessarcimentoSnapshot(spark: SparkSession, config: Map[String, String],
                               store: graft.sink.SnapshotStore, today: LocalDate,
                               firstYear: Int = 2023,
                               years: Option[Seq[Int]] = None): Map[Int, Long] = {
    if (years.isEmpty && !ressarcimentoDue(today)) return Map.empty
    yearLoop(spark, config, years.getOrElse(ressarcimentoYears(today, firstYear))) {
      case (year, Some(df)) =>
        Some(store.commitReplacePartitions(
          df.withColumn("ano", org.apache.spark.sql.functions.lit(year)), "ano"))
      case (year, None) =>
        // Only burn a delete version when the head actually carries the
        // year: an empty year that is already absent would otherwise
        // commit a byte-identical version on every due-window run (up to
        // 5 no-op versions per month), polluting the time-travel lineage.
        val headHasYear = store.latestVersion.exists { v =>
          !store.read(v)
            .filter(org.apache.spark.sql.functions.col("ano") <=> year).isEmpty
        }
        if (headHasYear) store.commitDeletePartition("ano", year) else None
    }
  }
}
