package graft

/** Loader for the committed per-query perf budgets
  * (artifacts/BENCH_BUDGET.json — the last judged round's driver bench
  * medians at sf0.1). Shared by [[Bench]] (emits `budget_violations`
  * in the round artifact) and BenchBudgetSpec (fails CI when the last
  * recorded bench shows a 2× single-query regression).
  *
  * Parsing is deliberately dependency-free: the file is
  * builder-generated flat JSON (`"name": 1.234` pairs under
  * `"queries"`), so one regex over the queries object is exact — no
  * SparkSession, no jackson setup, loadable from a spec before any
  * session exists. */
object BenchBudget {

  /** query name → budget seconds; empty map when the file is absent
    * (new checkout, budgets not yet committed) so callers degrade to
    * no-op rather than fail. */
  def load(path: String): Map[String, Double] = loadSection(path, "queries")

  /** Same flat `"name": number` parse for any named top-level object in
    * the artifact (e.g. `"mins"` — the min-of-N series the budget
    * tripwire compares since round 13). The section must contain only
    * scalar number values; the emitters keep `queries`/`mins` flat and
    * ahead of any nested object with a colliding key. */
  def loadSection(path: String, section: String): Map[String, Double] =
    try {
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      val qStart = text.indexOf("\"" + section + "\"")
      if (qStart < 0) Map.empty
      else {
        val body = text.substring(text.indexOf('{', qStart) + 1,
          text.indexOf('}', qStart))
        """"([^"]+)"\s*:\s*([0-9.Ee+-]+)""".r
          .findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .toMap
      }
    } catch { case _: Exception => Map.empty }
}
