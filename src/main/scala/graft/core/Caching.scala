package graft.core

import org.apache.spark.sql.DataFrame

/** The library's cache discipline, in one place (VERDICT r15 task 8 /
  * round-14 ADVICE: unpersist scoping of the ~20 query-internal cache
  * sites).
  *
  * Two legitimate cache lifetimes exist here and the call-site NAME says
  * which one a site is:
  *
  *  - [[Caching.planCache]] — the cached intermediate is referenced by
  *    the RETURNED lazy plan from more than one consumer (a self-join
  *    branch, a train+encode pair, a hits-join + top-1 aggregate). The
  *    query function cannot unpersist it: the caller has not executed
  *    the plan yet, and dropping the entry would silently re-run the
  *    expensive subtree (UDF sketching, Lloyd training) once per
  *    consumer. Lifetime is therefore the SESSION's, by contract:
  *    Bench/Verify call `spark.catalog.clearCache()` between queries
  *    and reps, and a library user owns the same call (README's
  *    embedding-session note). The default MEMORY_AND_DISK level means
  *    a long-lived session degrades to disk + LRU block eviction, never
  *    OOM, but the entries DO accumulate until cleared — which is why
  *    every such site is marked by this name instead of a bare
  *    `.cache()`.
  *
  *  - `persist → materialize → unpersist` inline — the intermediate is
  *    fully consumed INSIDE the function (written to a staged artifact,
  *    collected into a bounded driver table). These sites unpersist
  *    eagerly; nothing outlives the call.
  */
object Caching {
  implicit class PlanCacheOps(private val df: DataFrame) extends AnyVal {
    /** Session-lifetime cache for a multi-consumer intermediate of the
      * returned plan — see [[Caching]] for why it cannot be scoped. */
    def planCache(): DataFrame = df.cache()
  }
}
