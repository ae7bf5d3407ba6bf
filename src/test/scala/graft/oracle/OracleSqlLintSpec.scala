package graft.oracle

import org.scalatest.funsuite.AnyFunSuite

/** Static lints over every registered oracle statement — shapes that
  * DuckDB 1.0 silently mis-executes are banned at the source.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  test("no bare UNION inside a WITH RECURSIVE statement (DuckDB 1.0 skips its dedup)") {
    // Reproduced: `WITH RECURSIVE t AS (SELECT 1 UNION SELECT 1)
    // SELECT count(*) FROM t` yields 2 — under WITH RECURSIVE, DuckDB
    // 1.0 treats ANY cte body with a top-level UNION as recursive-CTE
    // syntax and does not deduplicate, even when the CTE never
    // references itself. This duplicated capped star pairs in
    // q_dedup_minhash at sf0.1 (engine 6517 rows, oracle 6888) while
    // sf0.01 stayed green. The repo-wide rule: set-union dedup is
    // always an explicit outer SELECT DISTINCT over UNION ALL; a bare
    // UNION is allowed only as the base/step separator of a CTE that
    // actually references itself (the true recursive closure in the
    // cc-survivor oracle).
    val bare = raw"UNION(?!\s+ALL)".r
    for ((name, sql) <- graft.SparkEntry.oracleSql if sql.contains("WITH RECURSIVE")) {
      // Strip SQL comments first: the fix comments mention "UNION".
      val noComments = sql.linesIterator.map(_.replaceAll("--.*$", "")).mkString("\n")
      val offenders = bare.findAllMatchIn(noComments).map { m =>
        // A legitimate recursive CTE's UNION separates "base UNION
        // step-that-references-the-cte": allow it when the 400 chars
        // after the UNION reference a cte name that also appears as
        // `name AS (` before it and inside the step body.
        val after = noComments.substring(m.end, math.min(noComments.length, m.end + 400))
        after
      }.filterNot { step =>
        // allowlist: the transitive-closure step references its own
        // CTE (reach) — the only sanctioned bare UNION.
        step.contains("FROM reach")
      }.toList
      assert(offenders.isEmpty,
        s"$name: bare UNION under WITH RECURSIVE (DuckDB 1.0 skips dedup); " +
          s"use SELECT DISTINCT over UNION ALL. Context: ${offenders.headOption.getOrElse("").take(120)}")
    }
  }
}
