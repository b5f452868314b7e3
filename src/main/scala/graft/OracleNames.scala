package graft

/** Prints the currently-registered oracle names, one per line — no
  * SparkSession, so it's cheap enough for automation to call every run.
  *
  * Exists so the sf100 sweep (scripts/sf100_sweep.py) can PIN its
  * enumerated set to the live registration instead of trusting a possibly
  * stale dumped oracle_sql.json: the round-12 rung ledger silently went
  * stale at 144 queries while the board grew (VERDICT r16 task 7). */
object OracleNames {
  def main(args: Array[String]): Unit =
    SparkEntry.oracleSql.keys.toSeq.sorted.foreach(println)
}
