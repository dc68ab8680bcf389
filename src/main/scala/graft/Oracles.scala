package graft

/** DuckDB oracle SQL for `SparkEntry.queries` (driver contract).
  *
  * Dialect notes (DuckDB vs Spark):
  *   - `regexp_replace` needs the `'g'` flag to match Spark's
  *     replace-all semantics;
  *   - Java's `[\p{Punct}&&[^a-zA-Z]]]` (class-intersection, a no-op
  *     here) is written for RE2 as `[[:punct:]]\]`;
  *   - `string_split` keeps trailing empty fields like Spark's `split`;
  *     Java-split semantics (reference) are emulated on both sides by
  *     stripping trailing commas first;
  *   - double aggregates are either exact (integer-valued doubles, or
  *     per-row-rounded integer cents summed as BIGINT) or rounded, so
  *     partial-aggregation order can never flip the hash compare.
  */
object Oracles {

  /** Sentiment lexicon IN-lists, GENERATED from the engine's constants —
    * Spark, the native expression, and DuckDB share one source of truth
    * (entries are require()-checked lowercase `[a-z]+`, so plain
    * single-quoting is safe). */
  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")
  private val Pos = inList(graft.functions.Sentiment.Positive)
  private val Neg = inList(graft.functions.Sentiment.Negative)

  /** Per-sentence lexicon score for sentence expr `s` (0–4, neutral 2). */
  private def score(s: String): String =
    s"""least(4.0::DOUBLE, greatest(0.0::DOUBLE, 2.0::DOUBLE
       |  + len(list_filter(string_split($s, ' '), t -> t IN $Pos))::DOUBLE
       |  - len(list_filter(string_split($s, ' '), t -> t IN $Neg))::DOUBLE))""".stripMargin

  /** P-7 cleaning chain over text expr `x`.
    *
    * RE2 `\s` excludes vertical tab (U+000B) while Java's includes it, so
    * the whitespace class is spelled out explicitly (same trick as the
    * `[!-~]` URL class in OraclesLlm) to keep both engines bit-identical.
    *
    * Known residual divergence: `\b`. Java's boundary tests Unicode
    * `Character.isLetterOrDigit` (so 'é'/'漢' are word chars) while
    * RE2's is ASCII-`\w`-based — a `\w*RT` run directly preceded by a
    * non-ASCII letter is kept by Java and stripped by RE2. The driver
    * corpus never produces that adjacency (verified green), and the
    * engine-of-record semantics are Java's (see
    * `TextCleanOps.isBoundWord` and the differential fuzz in
    * TextOpsSpec). */
  private def cleanText(x: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($x,
       |  '(\\b\\w*RT)|[^a-zA-Z0-9 \\t\\n\\x0b\\f\\r.,!@]', '', 'g'),
       |  '(http[^ \\t\\n\\x0b\\f\\r]+)', '', 'g'),
       |  '(@\\w+)', 'Foo', 'g'),
       |  '^(Foo)', '')""".stripMargin

  /** Sentence list of a cleaned text expr. */
  private def sents(x: String): String =
    s"list_filter([trim(q) for q in string_split_regex($x, '[.!?]')], q -> length(q) > 0)"

  /** A-4 weighted mean over a sentence-list expr (−1 when empty). */
  private def wscore(ss: String): String =
    s"""CASE WHEN len($ss) = 0 THEN -1.0::DOUBLE
       |  ELSE list_sum([${score("s")} * length(s)::DOUBLE for s in $ss])
       |     / list_sum([length(s)::DOUBLE for s in $ss]) END""".stripMargin

  /** U-2 bucketing over a score expr (labels already lowercase). */
  private def bucket(s: String): String =
    s"""CASE WHEN $s <= 0.0 THEN 'not_understood'
       |  WHEN $s < 1.0 THEN 'very_negative'
       |  WHEN $s < 2.0 THEN 'negative'
       |  WHEN $s < 3.0 THEN 'neutral'
       |  WHEN $s < 4.0 THEN 'positive'
       |  WHEN $s < 5.0 THEN 'very_positive'
       |  ELSE 'not_understood' END""".stripMargin

  /** P-8 country heuristic over `location` with `parts` precomputed. */
  private val countryExpr: String =
    s"""CASE WHEN contains(location, ',') THEN
       |  upper(trim(CASE WHEN length(trim(regexp_replace(
       |                     parts[len(parts)], '[[:punct:]]\\]', '', 'g'))) = 2
       |                   AND len(parts) = 2
       |             THEN 'USA' ELSE parts[len(parts)] END))
       |ELSE 'NULL' END""".stripMargin

  /** SQL-entry-path demo (`spark.sql` text + the registered
    * graft_sentiment extension function): weighted sentence sentiment
    * over RAW document text (no tweet-cleaning stage — the function is
    * the scorer alone). */
  val sqlDocSentiment: String =
    s"""WITH sentd AS (
       |  SELECT doc_id, lang, n_chars, ${sents("text")} AS ss
       |  FROM documents)
       |SELECT doc_id, lang, round(${wscore("ss")}, 4) AS sentiment
       |FROM sentd WHERE n_chars >= 100""".stripMargin

  /** Shared prefix: documents → synthetic wire lines → parsed → country →
    * sentiment → exploded per-hashtag rows `trows(doc_id, ts, hashtag,
    * sentiment_score, sentiment_type, country)`. Mirrors
    * `TrendPipeline.trendRows`. */
  val trendRowsCte: String =
    s"""WITH tw AS (
       |  SELECT doc_id,
       |         (1700000000 + (doc_id % 10) * 15)::INTEGER AS ts,
       |         (CASE doc_id % 5
       |            WHEN 0 THEN 'San Francisco, CA'
       |            WHEN 1 THEN 'Toronto, Ontario'
       |            WHEN 2 THEN 'Paris'
       |            WHEN 3 THEN 'Austin, TX'
       |            ELSE 'Berlin, Germany, EU' END) || ' /TLOC/ ' ||
       |         regexp_replace(regexp_replace(regexp_replace(text,
       |           '\\bspark\\b', '#spark', 'g'),
       |           '\\bdata\\b', '#data', 'g'),
       |           '\\bstream\\b', '#stream', 'g') AS line
       |  FROM documents
       |), parsed AS (
       |  SELECT doc_id, ts,
       |         string_split(line, ' /TLOC/ ')[1] AS location,
       |         string_split(line, ' /TLOC/ ')[2] AS txt
       |  FROM tw
       |), located AS (
       |  SELECT *, string_split(regexp_replace(location, ',+$$', ''), ',') AS parts
       |  FROM parsed
       |), countried AS (
       |  SELECT doc_id, ts, txt, $countryExpr AS country FROM located
       |), sentd AS (
       |  SELECT *, ${sents(cleanText("txt"))} AS ss FROM countried
       |), scored AS (
       |  SELECT doc_id, ts, txt, country, ${wscore("ss")} AS sentiment_score
       |  FROM sentd
       |), typed AS (
       |  SELECT *, lower(${bucket("sentiment_score")}) AS sentiment_type
       |  FROM scored
       |), trows AS (
       |  SELECT doc_id, ts,
       |         regexp_replace(tag, '(\\w*RT)|[^a-zA-Z0-9#]', '', 'g') AS hashtag,
       |         sentiment_score, sentiment_type, country
       |  FROM (SELECT *, unnest(list_filter(string_split(txt, ' '),
       |          t -> t LIKE '#%'
       |           AND length(regexp_replace(t, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) > 1)) AS tag
       |        FROM typed))""".stripMargin

  val trendRows: String =
    s"""$trendRowsCte
       |SELECT ts, hashtag, sentiment_score, sentiment_type, country
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY ts, hashtag, country ORDER BY sentiment_score) rn
       |      FROM trows)
       |WHERE rn = 1""".stripMargin

  val hashtagCounts: String =
    s"""$trendRowsCte
       |SELECT hashtag, count(*) AS cnt FROM trows GROUP BY hashtag""".stripMargin

  val meanSentiment: String =
    s"""$trendRowsCte
       |SELECT hashtag, round(avg(sentiment_score), 4) AS avg_sentiment
       |FROM trows GROUP BY hashtag""".stripMargin

  val countJoinSentiment: String =
    s"""$trendRowsCte
       |SELECT hashtag, count(*) AS cnt,
       |       round(avg(sentiment_score), 4) AS avg_sentiment
       |FROM trows GROUP BY hashtag""".stripMargin

  val topnTrends: String =
    s"""$trendRowsCte
       |SELECT ts, hashtag, cnt, rank FROM (
       |  SELECT ts, hashtag, count(*) AS cnt,
       |         row_number() OVER (PARTITION BY ts
       |           ORDER BY count(*) DESC, hashtag) AS rank
       |  FROM trows GROUP BY ts, hashtag)
       |WHERE rank <= 3""".stripMargin

  val countryExtract: String =
    s"""$trendRowsCte
       |SELECT doc_id, country FROM countried""".stripMargin

  val cleanTextQ: String =
    s"""SELECT doc_id,
       |  ${cleanText("'Check http://t.co/x ' || text || ' @' || source")} AS clean
       |FROM documents""".stripMargin

  val sentimentScore: String =
    s"""WITH sentd AS (
       |  SELECT doc_id, ${sents(cleanText("text"))} AS ss FROM documents
       |), scored AS (
       |  SELECT doc_id, ${wscore("ss")} AS sentiment_score FROM sentd)
       |SELECT doc_id, sentiment_score,
       |       lower(${bucket("sentiment_score")}) AS sentiment_type
       |FROM scored""".stripMargin

  val weightedSentiment: String =
    s"""WITH sentd AS (
       |  SELECT doc_id,
       |         ${sents("regexp_replace(text, '\\bbatch\\b', '.', 'g')")} AS ss
       |  FROM documents)
       |SELECT doc_id, ${wscore("ss")} AS wscore FROM sentd""".stripMargin

  val wireRoundtrip: String =
    s"""$trendRowsCte
       |SELECT doc_id, hashtag, sentiment_score, sentiment_type, country
       |FROM trows""".stripMargin

  /** Rollup of the rows the wire files carry — NULL strings become ""
    * on the wire (the documented loss), so the oracle coalesces. */
  val wireScan: String =
    s"""$trendRowsCte
       |SELECT COALESCE(country, '') AS country, count(*) AS n_rows,
       |  sum(round(sentiment_score * 10)::BIGINT)::BIGINT AS score_dm
       |FROM trows GROUP BY 1""".stripMargin

  val windowedCounts: String =
    s"""SELECT sec - (sec % 60) AS window_start, event_type, count(*) AS cnt
       |FROM (SELECT floor(epoch(ts))::BIGINT AS sec, event_type FROM events)
       |GROUP BY 1, 2""".stripMargin

  val slidingCounts: String =
    s"""SELECT (sec - off) - ((sec - off) % 60) + off AS window_start,
       |       event_type, count(*) AS cnt
       |FROM (SELECT floor(epoch(ts))::BIGINT AS sec, event_type,
       |             unnest([0, 15, 30, 45]::BIGINT[]) AS off
       |      FROM events)
       |GROUP BY 1, 2""".stripMargin

  val streamCount: String = "SELECT count(*) AS n FROM events"

  val sentimentDistribution: String =
    s"""$trendRowsCte
       |SELECT hashtag, sentiment_type, count(*) AS cnt
       |FROM trows GROUP BY hashtag, sentiment_type""".stripMargin

  val countsByCountry: String =
    s"""$trendRowsCte
       |SELECT country, count(*) AS cnt FROM trows GROUP BY country""".stripMargin

  val hashtagTimeseries: String =
    s"""$trendRowsCte
       |SELECT ts, hashtag, count(*) AS cnt,
       |       round(avg(sentiment_score), 4) AS avg_sentiment
       |FROM trows GROUP BY ts, hashtag""".stripMargin

  /** Spike detection over the per-hashtag timeseries: fire when
    * 1000·cnt·prev_n ≥ 1100·Σprev over the 3 preceding buckets
    * (row frame; +10% probe factor — see SparkEntry), warm-up rows
    * excluded. */
  val trendSpikes: String =
    s"""$trendRowsCte
       |SELECT ts, hashtag, cnt, prev_sum::BIGINT AS prev_sum,
       |  ((1000 * cnt * prev_n) // prev_sum)::BIGINT AS spike_ratio_pm
       |FROM (
       |  SELECT ts, hashtag, cnt,
       |    sum(cnt) OVER w AS prev_sum,
       |    count(cnt) OVER w AS prev_n
       |  FROM (SELECT ts, hashtag, count(*) AS cnt
       |        FROM trows GROUP BY ts, hashtag)
       |  WINDOW w AS (PARTITION BY hashtag ORDER BY ts
       |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
       |WHERE prev_n = 3 AND 1000 * cnt * prev_n >= 1100 * prev_sum""".stripMargin

  /** DuckDB has a native ASOF JOIN — the ideal oracle for our
    * union+carry-forward implementation. Right side pre-aggregated to
    * one row per (user, sec) so tie-breaking is deterministic in both
    * engines. */
  val asofJoin: String =
    s"""WITH p AS (
       |  SELECT user_id, floor(epoch(ts))::BIGINT AS sec,
       |         max(value) AS purchase_value
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |c AS (
       |  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS sec
       |  FROM events WHERE event_type = 'click')
       |SELECT c.event_id, c.user_id, c.sec, p.purchase_value
       |FROM c ASOF LEFT JOIN p
       |  ON c.user_id = p.user_id AND c.sec >= p.sec""".stripMargin

  val userSessions: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec FROM events
       |), lagged AS (
       |  SELECT user_id, event_id, sec,
       |    lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
       |  FROM e
       |), marked AS (
       |  SELECT user_id, sec,
       |    (CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END)::BIGINT
       |      AS new_sess,
       |    event_id
       |  FROM lagged
       |), sessioned AS (
       |  SELECT user_id, sec,
       |    (sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
       |  FROM marked)
       |SELECT user_id, session_id, count(*) AS n_events,
       |       min(sec) AS session_start, max(sec) AS session_end
       |FROM sessioned GROUP BY user_id, session_id""".stripMargin

  /** Native `session_window` twin ([[graft.ops.Windows
    * .sessionWindowCounts]]): gaps-and-islands over RAW microsecond
    * timestamps (no floor-second cast — the one semantic difference
    * from [[userSessions]]) with the built-in operator's boundary
    * semantics as pinned empirically in WindowsSpec: an event exactly
    * at the previous window's end MERGES, i.e. sessions split only on
    * a strictly greater gap; the emitted end is last-event + gap. */
  val sessionWindowCounts: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS us FROM events
       |), lagged AS (
       |  SELECT user_id, us,
       |    lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
       |  FROM e
       |), marked AS (
       |  SELECT user_id, us,
       |    (CASE WHEN prev IS NULL OR us - prev > 1800000000
       |      THEN 1 ELSE 0 END)::BIGINT AS new_sess
       |  FROM lagged
       |), sessioned AS (
       |  SELECT user_id, us,
       |    (sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS sid
       |  FROM marked)
       |SELECT user_id, min(us) AS session_start_us,
       |  max(us) + 1800000000 AS session_end_us,
       |  count(*)::BIGINT AS n_events
       |FROM sessioned GROUP BY user_id, sid""".stripMargin

  /** JSON props stats ([[graft.ops.Windows.eventPropStats]]):
    * schema-on-read extraction of the k key, missing keys counted. */
  val eventPropStats: String =
    s"""SELECT event_type, count(*)::BIGINT AS n_events,
       |  sum(coalesce(CAST((props::JSON)->>'k' AS BIGINT), 0))::BIGINT AS k_sum,
       |  max(CAST((props::JSON)->>'k' AS BIGINT))::BIGINT AS k_max,
       |  sum(CASE WHEN (props::JSON)->>'k' IS NULL THEN 1 ELSE 0 END)::BIGINT
       |    AS n_missing,
       |  (sum(coalesce(CAST((props::JSON)->>'k' AS BIGINT), 0)) // count(*))::BIGINT
       |    AS mean_k
       |FROM events GROUP BY event_type""".stripMargin

  /** Daily activity PIVOT ([[graft.ops.Windows.eventTypePivot]]): the
    * pinned-type-list conditional-count form — identical semantics to
    * Spark's pivot with an explicit value list, dense zeros. */
  val eventTypePivot: String =
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
       |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
       |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
       |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
       |    AS purchase,
       |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
       |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
       |FROM events GROUP BY 1""".stripMargin

  /** Q10-shaped returned-revenue top-20 ([[graft.ops.Relational
    * .topReturnedCustomers]]): same integer-unit revenue, same
    * custkey tiebreak. */
  val topReturnedCustomers: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |    / 10000.0 AS revenue
       |FROM lineitem, orders, customer, nation
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Multi-level revenue rollup ([[graft.ops.Relational.revenueRollup]]):
    * GROUP BY ROLLUP with the multi-argument GROUPING bitmask — the
    * same (region, nation) → subtotal → grand-total lattice and the
    * same integer-cents revenue as the engine. */
  val revenueRollup: String =
    s"""SELECT r_name, n_name, grouping(r_name, n_name)::BIGINT AS lvl,
       |  count(*) AS n_orders,
       |  sum(round(o_totalprice * 100)::BIGINT) / 100.0 AS revenue
       |FROM orders, customer, nation, region
       |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
       |  AND n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)""".stripMargin

  /** Sessionization rollup ([[graft.ops.Windows.sessionStats]]): the
    * [[userSessions]] chain wrapped as a derived table, then one
    * integer-exact grand aggregate. */
  val sessionStats: String =
    s"""SELECT count(*)::BIGINT AS n_sessions,
       |  sum(n_events)::BIGINT AS total_events,
       |  sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_single,
       |  ((1000 * sum(n_events)) // count(*))::BIGINT AS mean_events_pm,
       |  sum(session_end - session_start)::BIGINT AS total_dur_sec,
       |  max(session_end - session_start)::BIGINT AS max_dur_sec,
       |  (sum(session_end - session_start) // count(*))::BIGINT AS mean_dur_sec
       |FROM ($userSessions)""".stripMargin

  /** Ordered conversion funnel ([[graft.ops.Windows.eventFunnel]]):
    * chained per-user min-time prefixes (a stage counts only at or
    * after the previous stage's completion), then the |stages|-row
    * report with cumulative and per-edge permilles. */
  val eventFunnel: String =
    s"""WITH e AS (
       |  SELECT user_id, floor(epoch(ts))::BIGINT AS sec, event_type
       |  FROM events),
       |s0 AS (
       |  SELECT user_id, min(sec) AS t FROM e
       |  WHERE event_type = 'view' GROUP BY user_id),
       |s1 AS (
       |  SELECT e.user_id, min(sec) AS t FROM e JOIN s0 USING (user_id)
       |  WHERE event_type = 'click' AND sec >= s0.t GROUP BY e.user_id),
       |s2 AS (
       |  SELECT e.user_id, min(sec) AS t FROM e JOIN s1 USING (user_id)
       |  WHERE event_type = 'purchase' AND sec >= s1.t GROUP BY e.user_id),
       |counts AS (
       |  SELECT 0::BIGINT AS stage_idx, 'view' AS stage,
       |         count(*)::BIGINT AS n_users FROM s0
       |  UNION ALL SELECT 1::BIGINT, 'click', count(*)::BIGINT FROM s1
       |  UNION ALL SELECT 2::BIGINT, 'purchase', count(*)::BIGINT FROM s2)
       |SELECT stage_idx, stage, n_users,
       |  CASE WHEN first_value(n_users) OVER w > 0
       |    THEN ((1000 * n_users) // first_value(n_users) OVER w)::BIGINT
       |  END AS conv_pm,
       |  CASE WHEN lag(n_users) OVER w > 0
       |    THEN ((1000 * n_users) // lag(n_users) OVER w)::BIGINT
       |  END AS step_pm
       |FROM counts
       |WINDOW w AS (ORDER BY stage_idx
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Cohort retention ([[graft.ops.Windows.cohortRetention]]): distinct
    * user-day activity, min-day cohorts, (cohort, offset) cells with
    * cohort-size permilles — all integer day arithmetic. */
  val cohortRetention: String =
    s"""WITH a AS (
       |  SELECT DISTINCT user_id,
       |         floor(epoch(ts))::BIGINT // 86400 AS day
       |  FROM events),
       |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id),
       |cells AS (
       |  SELECT cohort_day, day - cohort_day AS day_offset,
       |         count(*)::BIGINT AS n_active
       |  FROM a JOIN c USING (user_id) GROUP BY 1, 2),
       |sizes AS (
       |  SELECT cohort_day, count(*)::BIGINT AS cohort_size FROM c
       |  GROUP BY cohort_day)
       |SELECT cohort_day, day_offset, n_active, cohort_size,
       |       ((1000 * n_active) // cohort_size)::BIGINT AS retention_pm
       |FROM cells JOIN sizes USING (cohort_day)""".stripMargin

  /** Trailing 7-day active users
    * ([[graft.ops.Windows.rollingActiveUsers]]): distinct (user, day)
    * fans out to its 7 report days, second distinct, per-day count;
    * report days past the data's max day are dropped. */
  val rollingActiveUsers: String =
    s"""WITH a AS (
       |  SELECT DISTINCT user_id,
       |         floor(epoch(ts))::BIGINT // 86400 AS day
       |  FROM events),
       |mx AS (SELECT max(day) AS max_day FROM a),
       |f AS (
       |  SELECT DISTINCT user_id, day + o AS report_day
       |  FROM a, unnest(range(0, 7)) AS u(o), mx
       |  WHERE day + o <= mx.max_day)
       |SELECT report_day, count(*)::BIGINT AS active_users
       |FROM f GROUP BY report_day""".stripMargin

  /** First-order transition matrix
    * ([[graft.ops.Windows.eventTransitions]]): per-user lag pairs,
    * |types|²-cell counts, row-normalized permilles. */
  val eventTransitions: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec,
       |         event_type
       |  FROM events),
       |l AS (
       |  SELECT event_type,
       |    lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id) AS prev_type
       |  FROM e),
       |p AS (
       |  SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS cnt
       |  FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT prev_type, sum(cnt)::BIGINT AS row_total FROM p
       |      GROUP BY prev_type)
       |SELECT prev_type, next_type, cnt,
       |       ((1000 * cnt) // row_total)::BIGINT AS transition_pm
       |FROM p JOIN t USING (prev_type)""".stripMargin

  /** Funnel completion latency ([[graft.ops.Windows.funnelLatency]]):
    * the chained min-time prefixes carried to the last stage, then
    * count / min / discrete lower median / max of t_last − t_first. */
  val funnelLatency: String =
    s"""WITH e AS (
       |  SELECT user_id, floor(epoch(ts))::BIGINT AS sec, event_type
       |  FROM events),
       |s0 AS (
       |  SELECT user_id, min(sec) AS t0 FROM e
       |  WHERE event_type = 'view' GROUP BY user_id),
       |s1 AS (
       |  SELECT e.user_id, s0.t0, min(sec) AS t FROM e JOIN s0 USING (user_id)
       |  WHERE event_type = 'click' AND sec >= s0.t0 GROUP BY 1, 2),
       |s2 AS (
       |  SELECT e.user_id, s1.t0, min(sec) AS t FROM e JOIN s1 USING (user_id)
       |  WHERE event_type = 'purchase' AND sec >= s1.t GROUP BY 1, 2),
       |lat AS (SELECT t - t0 AS latency_sec FROM s2)
       |SELECT count(*)::BIGINT AS n_converted, min(latency_sec) AS min_sec,
       |  quantile_disc(latency_sec, 0.5) AS median_sec,
       |  max(latency_sec) AS max_sec
       |FROM lat""".stripMargin

  /** Robust per-type outlier stats ([[graft.ops.Windows.valueOutliers]]):
    * micro-quantized values, discrete lower median + MAD
    * (`quantile_disc(0.5)` = the ⌈n/2⌉-th smallest, matching the
    * row_number form), 3·MAD outlier counts. */
  val valueOutliers: String =
    s"""WITH v AS (
       |  SELECT event_type, round(value * 1000000)::BIGINT AS v FROM events
       |  WHERE value IS NOT NULL),
       |med AS (
       |  SELECT event_type, quantile_disc(v, 0.5) AS med FROM v
       |  GROUP BY event_type),
       |dev AS (
       |  SELECT v.event_type, v.v, med.med, abs(v.v - med.med) AS dev
       |  FROM v JOIN med USING (event_type)),
       |mad AS (
       |  SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM dev
       |  GROUP BY event_type)
       |SELECT d.event_type, count(*)::BIGINT AS n_events,
       |  max(d.med) AS median_micro, max(m.mad) AS mad_micro,
       |  sum(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END)::BIGINT
       |    AS n_outliers,
       |  ((1000 * sum(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END))
       |    // count(*))::BIGINT AS outlier_pm
       |FROM dev d JOIN mad m USING (event_type)
       |GROUP BY d.event_type""".stripMargin

  /** The flatMapGroupsWithState batch twin emits (user, start, end, n)
    * without a session ordinal — same lag/cumsum CTEs, projected down. */
  val statefulSessions: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec FROM events
       |), lagged AS (
       |  SELECT user_id, event_id, sec,
       |    lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
       |  FROM e
       |), marked AS (
       |  SELECT user_id, sec,
       |    (CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END)::BIGINT
       |      AS new_sess,
       |    event_id
       |  FROM lagged
       |), sessioned AS (
       |  SELECT user_id, sec,
       |    (sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
       |  FROM marked)
       |SELECT user_id, min(sec) AS session_start, max(sec) AS session_end,
       |       count(*) AS n_events
       |FROM sessioned GROUP BY user_id, session_id""".stripMargin

  val q1Agg: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  sum(round(l_quantity * 100)::BIGINT) / 100.0 AS sum_qty,
       |  sum(round(l_extendedprice * 100)::BIGINT) / 100.0 AS sum_base_price,
       |  sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |    / 10000.0 AS sum_disc_price,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= DATE '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val q3Join: String =
    s"""SELECT o_orderkey, revenue_c / 10000.0 AS revenue, o_orderdate
       |FROM (
       |  SELECT o_orderkey, o_orderdate,
       |         sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |           AS revenue_c
       |  FROM customer, orders, lineitem
       |  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |    AND c_mktsegment = 'BUILDING'
       |    AND o_orderdate < DATE '1995-03-15'
       |    AND l_shipdate > DATE '1995-03-15'
       |  GROUP BY o_orderkey, o_orderdate)
       |ORDER BY revenue_c DESC, o_orderkey
       |LIMIT 10""".stripMargin

  /** Bilateral shipping volume ([[graft.ops.Relational.nationVolume]],
    * the Q7 shape): both directions of the NATION_9/NATION_10 pair,
    * per year, per-row-rounded integer revenue units. */
  val nationVolume: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  year(l_shipdate)::BIGINT AS l_year,
       |  sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |    / 10000.0 AS revenue
       |FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |  AND c_custkey = o_custkey
       |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
       |  AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
       |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
       |  AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
       |GROUP BY 1, 2, 3""".stripMargin

  /** Referential-integrity audit
    * ([[graft.ops.Relational.integrityReport]]): per FK edge, child
    * rows and NOT-EXISTS orphan counts. */
  val integrityReport: String = {
    def edge(name: String, child: String, ck: String,
             parent: String, pk: String): String =
      s"""SELECT '$name' AS fk_edge,
         |  (SELECT count(*) FROM $child)::BIGINT AS n_rows,
         |  (SELECT count(*) FROM $child c
         |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
         |     WHERE c.$ck = p.$pk))::BIGINT AS n_orphans""".stripMargin
    Seq(
      edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      edge("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      edge("customer.c_nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      edge("supplier.s_nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      edge("nation.n_regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"))
      .mkString("", "\nUNION ALL\n", "")
  }

  /** The salted join must be result-identical to the plain join+rollup —
    * the oracle knows nothing about salt. */
  val orderRevenueSalted: String =
    s"""SELECT o_orderkey, o_orderdate, count(*) AS n_lines,
       |       sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |         / 10000.0 AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderkey, o_orderdate""".stripMargin

  val customersByRegion: String =
    s"""SELECT r_name, count(*) AS n_customers,
       |       sum(round(c_acctbal * 100)::BIGINT) / 100.0 AS sum_acctbal
       |FROM customer, nation, region
       |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |GROUP BY r_name""".stripMargin

  val q5RegionVolume: String =
    s"""SELECT n_name,
       |  sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |    / 10000.0 AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= DATE '1995-01-01'
       |  AND o_orderdate < DATE '1996-01-01'
       |GROUP BY n_name""".stripMargin

  /** Range join: the oracle states the raw inequality join (DuckDB
    * plans an IEJoin); the engine's bucketed binning + day pre-agg
    * must be result-identical. */
  val rangeJoin: String =
    s"""SELECT o_orderkey, count(l_shipdate)::BIGINT AS n_shipped
       |FROM orders o LEFT JOIN lineitem l
       |  ON l.l_shipdate >= o.o_orderdate
       | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
       |GROUP BY o_orderkey""".stripMargin

  /** Q4-shaped EXISTS ([[graft.ops.Relational.returnPriorityCounts]]):
    * the oracle states the correlated EXISTS; the engine's left-semi
    * join must be result-identical. */
  val returnPriorityCounts: String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE EXISTS (SELECT 1 FROM lineitem
       |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       |GROUP BY o_orderpriority""".stripMargin

  /** Q6-shaped scan-aggregate ([[graft.ops.Relational.discountRevenue]]):
    * discount band on per-row-rounded integer basis points, matching
    * the engine's float-boundary discipline. */
  val discountRevenue: String =
    s"""SELECT sum(round(l_extendedprice * l_discount * 10000)::BIGINT)
       |    / 10000.0 AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= DATE '1995-01-01'
       |  AND l_shipdate < DATE '1996-01-01'
       |  AND round(l_discount * 10000)::BIGINT BETWEEN 500 AND 700
       |  AND l_quantity < 24""".stripMargin

  /** Q13-shaped order-count distribution
    * ([[graft.ops.Relational.customerOrderDistribution]]): the left
    * outer join keeps zero-order customers; `count(o_orderkey)` skips
    * their NULLs into the k=0 bucket. */
  val customerOrderDistribution: String =
    s"""SELECT c_count, count(*) AS custdist FROM (
       |  SELECT c_custkey, count(o_orderkey) AS c_count
       |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
       |  GROUP BY c_custkey)
       |GROUP BY c_count""".stripMargin

  /** Q18-shaped large-volume orders
    * ([[graft.ops.Relational.largeQuantityOrders]]): HAVING on the
    * integer centi-quantity rollup, then the customer join. */
  val largeQuantityOrders: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  qty_c / 100.0 AS total_qty
       |FROM (
       |  SELECT l_orderkey, sum(round(l_quantity * 100)::BIGINT) AS qty_c
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING sum(round(l_quantity * 100)::BIGINT) > 20000) big
       |JOIN orders ON big.l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** Q21-shaped sole-culprit suppliers
    * ([[graft.ops.Relational.soleReturnSuppliers]]): the oracle states
    * the EXISTS/NOT-EXISTS pair over per-(order,supplier) return
    * marks; the engine's single-pass aggregation rewrite must match,
    * including the count-desc/suppkey top-20 cut. */
  val soleReturnSuppliers: String =
    s"""WITH rs AS (
       |  SELECT l_orderkey, l_suppkey,
       |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
       |  FROM lineitem GROUP BY l_orderkey, l_suppkey)
       |SELECT s_name, s_suppkey, count(*) AS numwait
       |FROM rs r1 JOIN supplier ON r1.l_suppkey = s_suppkey
       |WHERE r1.ret = 1
       |  AND EXISTS (SELECT 1 FROM rs r2
       |    WHERE r2.l_orderkey = r1.l_orderkey
       |      AND r2.l_suppkey <> r1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM rs r3
       |    WHERE r3.l_orderkey = r1.l_orderkey
       |      AND r3.l_suppkey <> r1.l_suppkey AND r3.ret = 1)
       |GROUP BY s_name, s_suppkey
       |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin

  /** Weekly distinct users via mergeable HLL sketches
    * ([[graft.ops.Windows.hllWeeklyUsers]]): the oracle recounts the
    * exact side from scratch and pins the engine's two sketch
    * invariants (re-aggregation invariance, error bound) at 1 — the
    * estimates themselves never cross engines. */
  val hllWeeklyUsers: String =
    s"""SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
       |  count(DISTINCT date_trunc('day', ts))::BIGINT AS n_days,
       |  count(DISTINCT user_id)::BIGINT AS exact_users,
       |  1::BIGINT AS est_ok, 1::BIGINT AS merge_invariant
       |FROM events GROUP BY 1""".stripMargin

  /** ANALYZE-style column stats ([[graft.ops.Relational.columnStats]]):
    * one row per profiled lineitem column — exact ndv, null count,
    * cents/date-rendered min & max. */
  val columnStats: String = {
    def row(c: String, minMax: String => String): String =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
         |  count(DISTINCT $c)::BIGINT AS ndv,
         |  ${minMax(s"min($c)")} AS min_v,
         |  ${minMax(s"max($c)")} AS max_v
         |FROM lineitem""".stripMargin
    val cents = (x: String) => s"(round($x * 100)::BIGINT)::VARCHAR"
    val str = (x: String) => s"($x)::VARCHAR"
    val date = (x: String) => s"strftime($x, '%Y-%m-%d')"
    Seq(row("l_quantity", cents), row("l_extendedprice", cents),
      row("l_shipdate", date), row("l_returnflag", str))
      .mkString("", "\nUNION ALL\n", "")
  }

  /** Q19-shaped disjunctive bands ([[graft.ops.Relational
    * .brandBandRevenue]]): same three OR-arms on integer centi-
    * quantities. */
  val brandBandRevenue: String =
    s"""SELECT p_brand, count(*) AS n_lines,
       |  sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |    / 10000.0 AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1'
       |    AND round(l_quantity * 100)::BIGINT BETWEEN 100 AND 1100)
       |  OR (p_brand = 'Brand#2'
       |    AND round(l_quantity * 100)::BIGINT BETWEEN 1000 AND 2000)
       |  OR (p_brand = 'Brand#3'
       |    AND round(l_quantity * 100)::BIGINT BETWEEN 2000 AND 3600)
       |GROUP BY p_brand""".stripMargin

  /** Q17-shaped small-quantity revenue ([[graft.ops.Relational
    * .smallQuantityRevenue]]): the decorrelated per-part average with
    * the division-free cross-multiplied threshold. */
  val smallQuantityRevenue: String =
    s"""WITH li AS (
       |  SELECT l_partkey, round(l_quantity * 100)::BIGINT AS qty_c,
       |    l_extendedprice
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = 'Brand#23'),
       |pp AS (SELECT l_partkey, sum(qty_c)::BIGINT AS sum_c,
       |         count(*)::BIGINT AS cnt
       |       FROM li GROUP BY l_partkey)
       |SELECT count(*) AS n_lines,
       |  sum(round(l_extendedprice * 100)::BIGINT) / 100.0 / 7.0
       |    AS avg_yearly
       |FROM li JOIN pp USING (l_partkey)
       |WHERE qty_c * 5 * cnt < sum_c""".stripMargin

  /** Q8-shaped market share ([[graft.ops.Relational.marketShare]]):
    * same conditional-sum revenue split, same integer permille. */
  val marketShare: String =
    s"""SELECT year(o_orderdate)::BIGINT AS o_year,
       |  sum(CASE WHEN n2.n_name = 'NATION_9'
       |      THEN round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT
       |      ELSE 0 END) / 10000.0 AS nation_revenue,
       |  sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |    / 10000.0 AS total_revenue,
       |  ((1000 * sum(CASE WHEN n2.n_name = 'NATION_9'
       |      THEN round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT
       |      ELSE 0 END))
       |    // sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |  )::BIGINT AS share_pm
       |FROM lineitem, orders, customer, part, supplier,
       |  nation n1, nation n2, region
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND l_partkey = p_partkey AND l_suppkey = s_suppkey
       |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
       |  AND s_nationkey = n2.n_nationkey
       |  AND r_name = 'ASIA' AND p_type = 'STANDARD'
       |  AND o_orderdate >= DATE '1995-01-01'
       |  AND o_orderdate < DATE '1997-01-01'
       |GROUP BY 1""".stripMargin

  /** Q14-shaped promo share ([[graft.ops.Relational.promoShare]]). */
  val promoShare: String =
    s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       |  sum(CASE WHEN p_type = 'PROMO'
       |      THEN round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT
       |      ELSE 0 END) / 10000.0 AS promo_revenue,
       |  sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |    / 10000.0 AS total_revenue,
       |  ((1000 * sum(CASE WHEN p_type = 'PROMO'
       |      THEN round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT
       |      ELSE 0 END))
       |    // sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |  )::BIGINT AS promo_pm
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |GROUP BY 1""".stripMargin

  /** Z-order layout report ([[graft.ops.Windows.zOrderLayout]]): the
    * quantize → interleave → bucket chain replayed with the unrolled
    * 8-term Morton sum — all integer ops, bit-identical. */
  val zOrderLayout: String = zOrderLayoutFor(32)

  /** Parameterized on the bucket count so the divisor is derived from the
    * same 65536/buckets constant as the engine (which `require`s that
    * buckets divides 65536). */
  def zOrderLayoutFor(buckets: Int): String = {
    require(buckets > 0 && 65536 % buckets == 0)
    val div = 65536L / buckets
    val terms = (0 until 8).map(i =>
      s"((uq >> $i) & 1) * ${1L << (2 * i)} + " +
        s"((dq >> $i) & 1) * ${1L << (2 * i + 1)}").mkString(" + ")
    s"""WITH b AS (
       |  SELECT user_id,
       |    datediff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS d
       |  FROM events),
       |r AS (SELECT min(user_id) AS u_min, max(user_id) AS u_max,
       |        min(d) AS d_min, max(d) AS d_max FROM b),
       |q AS (SELECT user_id, d,
       |    ((user_id - u_min) * 256) // (u_max - u_min + 1) AS uq,
       |    ((d - d_min) * 256) // (d_max - d_min + 1) AS dq
       |  FROM b, r),
       |z AS (SELECT user_id, d, ($terms)::BIGINT AS z FROM q)
       |SELECT (z // $div)::BIGINT AS bucket, count(*)::BIGINT AS n_rows,
       |  min(user_id)::BIGINT AS min_user, max(user_id)::BIGINT AS max_user,
       |  min(d)::BIGINT AS min_day, max(d)::BIGINT AS max_day
       |FROM z GROUP BY 1""".stripMargin
  }

  /** Peak session concurrency ([[graft.ops.Windows
    * .sessionConcurrency]]): the [[userSessions]] chain, then the
    * same delta sweep (+1 at start, −1 at end+1, net per second,
    * running max) per start day. */
  val sessionConcurrency: String =
    s"""WITH s AS (
       |  -- make_timestamp yields a naive TIMESTAMP, so the day renders
       |  -- timezone-free regardless of the DuckDB host's TimeZone (the
       |  -- Spark side pins UTC; to_timestamp here would be TIMESTAMPTZ
       |  -- and drift on a non-UTC driver host).
       |  SELECT strftime(make_timestamp(session_start * 1000000), '%Y-%m-%d')
       |    AS day, session_start, session_end
       |  FROM ($userSessions)),
       |deltas AS (
       |  SELECT day, t, sum(d)::BIGINT AS net FROM (
       |    SELECT day, session_start AS t, 1 AS d FROM s
       |    UNION ALL
       |    SELECT day, session_end + 1 AS t, -1 AS d FROM s)
       |  GROUP BY day, t),
       |run AS (
       |  SELECT day, sum(net) OVER (PARTITION BY day ORDER BY t
       |    ROWS UNBOUNDED PRECEDING)::BIGINT AS running
       |  FROM deltas)
       |SELECT r.day, n.n_sessions, r.peak_concurrent FROM
       |  (SELECT day, max(running) AS peak_concurrent FROM run GROUP BY day) r
       |  JOIN (SELECT day, count(*)::BIGINT AS n_sessions FROM s GROUP BY day) n
       |  ON r.day = n.day""".stripMargin

  /** Melted pivot ([[graft.ops.Windows.eventTypeMelt]]): dense
    * day × pinned-type long form, zeros included — the oracle builds
    * the dense frame from the day/type cross join directly. */
  val eventTypeMelt: String =
    s"""WITH days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day
       |  FROM events),
       |types AS (SELECT unnest(['click','error','purchase','signup',
       |  'view']) AS event_type),
       |c AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       |  count(*)::BIGINT AS n FROM events GROUP BY 1, 2)
       |SELECT days.day, types.event_type,
       |  coalesce(c.n, 0)::BIGINT AS n_events
       |FROM days CROSS JOIN types
       |LEFT JOIN c ON c.day = days.day AND c.event_type = types.event_type""".stripMargin

  /** Market-basket pairs ([[graft.ops.Relational.basketPairs]]):
    * same distinct → pair → integer-permille scoring chain, same
    * lift-desc/(part_a, part_b) top-100 cut. */
  val basketPairs: String =
    s"""WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM i),
       |ic AS (SELECT l_partkey, count(*) AS item_cnt FROM i GROUP BY 1),
       |p AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |    count(*)::BIGINT AS pair_cnt
       |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2)
       |SELECT part_a, part_b, pair_cnt,
       |  (1000 * pair_cnt // n_orders)::BIGINT AS support_pm,
       |  (1000 * pair_cnt // ca.item_cnt)::BIGINT AS conf_pm,
       |  ((1000 * pair_cnt * n_orders)
       |    // (ca.item_cnt * cb.item_cnt))::BIGINT AS lift_milli
       |FROM p, tot, ic ca, ic cb
       |WHERE ca.l_partkey = part_a AND cb.l_partkey = part_b
       |ORDER BY lift_milli DESC, part_a, part_b LIMIT 100""".stripMargin

  /** Daily EWMA spike series ([[graft.ops.Windows.dailyEwma]]): the
    * fixed-point recurrence replayed as a recursive CTE — integer
    * milli-counts and `//` make every step bit-identical. */
  val dailyEwma: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT event_type,
       |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |    count(*)::BIGINT AS cnt,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY date_trunc('day', ts)) AS rn
       |  FROM events GROUP BY event_type, date_trunc('day', ts)),
       |r AS (
       |  SELECT event_type, day, cnt, rn, cnt * 1000 AS ewma,
       |    0::BIGINT AS spike
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.event_type, d.day, d.cnt, d.rn,
       |    (300 * d.cnt * 1000 + 700 * r.ewma) // 1000,
       |    (CASE WHEN d.cnt * 1000000 > 2000 * r.ewma
       |          THEN 1 ELSE 0 END)::BIGINT
       |  FROM d JOIN r ON d.event_type = r.event_type AND d.rn = r.rn + 1)
       |SELECT event_type, day, cnt AS n_events, ewma AS ewma_milli,
       |  spike AS is_spike
       |FROM r""".stripMargin

  /** Holt double smoothing ([[graft.ops.Windows.dailyHolt]]):
    * recursive CTE replay with the same explicit FLOOR division the
    * engine writes out (the trend term goes negative on down-ramps,
    * where truncation and flooring disagree). */
  val dailyHolt: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT event_type,
       |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |    count(*)::BIGINT AS cnt,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY date_trunc('day', ts)) AS rn
       |  FROM events GROUP BY event_type, date_trunc('day', ts)),
       |r AS (
       |  SELECT event_type, day, cnt, rn, cnt * 1000 AS lvl,
       |    0::BIGINT AS tr
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT event_type, day, cnt, rn, lvl2 AS lvl,
       |    (((200 * (lvl2 - lvl1) + 800 * tr1) - (((200 * (lvl2 - lvl1) + 800 * tr1) % 1000 + 1000) % 1000)) // 1000) AS tr
       |  FROM (
       |    SELECT d.event_type, d.day, d.cnt, d.rn,
       |      r.lvl AS lvl1, r.tr AS tr1,
       |      (((300 * d.cnt * 1000 + 700 * (r.lvl + r.tr)) - (((300 * d.cnt * 1000 + 700 * (r.lvl + r.tr)) % 1000 + 1000) % 1000)) // 1000) AS lvl2
       |    FROM d JOIN r ON d.event_type = r.event_type
       |      AND d.rn = r.rn + 1))
       |SELECT event_type, day, cnt AS n_events, lvl AS level_milli,
       |  tr AS trend_milli, (lvl + tr)::BIGINT AS forecast_milli
       |FROM r""".stripMargin

  /** Ratio-to-report window
    * ([[graft.ops.Relational.nationRevenueShare]]). */
  val nationRevenueShare: String =
    s"""WITH rev AS (
       |  SELECT r_name, n_name,
       |    sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |      ::BIGINT AS rev_c
       |  FROM lineitem, supplier, nation, region
       |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |    AND n_regionkey = r_regionkey
       |  GROUP BY 1, 2)
       |SELECT r_name, n_name, rev_c,
       |  ((1000 * rev_c) // (sum(rev_c) OVER (PARTITION BY r_name)))
       |    ::BIGINT AS share_pm,
       |  rank() OVER (PARTITION BY r_name
       |    ORDER BY rev_c DESC, n_name)::BIGINT AS region_rank
       |FROM rev""".stripMargin

  /** Dense-rank top parts per nation
    * ([[graft.ops.Relational.topPartsPerNation]]): ties kept. */
  val topPartsPerNation: String =
    s"""WITH rev AS (
       |  SELECT n_name, l_partkey AS partkey,
       |    sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS rev_c
       |  FROM lineitem, supplier, nation
       |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, partkey, rev_c, rnk FROM (
       |  SELECT *, dense_rank() OVER (PARTITION BY n_name
       |    ORDER BY rev_c DESC)::BIGINT AS rnk FROM rev)
       |WHERE rnk <= 3""".stripMargin

  /** Custom-operator top-k ([[graft.ops.Relational
    * .topPartsPerNationNative]]): row_number semantics — the engine
    * side runs the heap-per-key physical operator. */
  val topPartsPerNationNative: String =
    s"""WITH rev AS (
       |  SELECT n_name, l_partkey AS partkey,
       |    sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS rev_c
       |  FROM lineitem, supplier, nation
       |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, partkey, rev_c, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY n_name
       |    ORDER BY rev_c DESC, partkey)::BIGINT AS rank FROM rev)
       |WHERE rank <= 3""".stripMargin

  /** New vs returning actives ([[graft.ops.Windows.newVsReturning]]). */
  val newVsReturning: String =
    s"""WITH act AS (
       |  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
       |  FROM events),
       |fs AS (SELECT user_id, min(day) AS first_day FROM act GROUP BY 1)
       |SELECT day, count(*)::BIGINT AS n_active,
       |  sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)::BIGINT AS n_new,
       |  (count(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END))
       |    ::BIGINT AS n_returning
       |FROM act JOIN fs USING (user_id)
       |GROUP BY 1""".stripMargin

  /** Pairwise distinct-user overlap ([[graft.ops.Windows
    * .userTypeOverlap]]): the oracle recounts the exact pair overlap
    * from scratch and pins the KMV sketch's error bound and exact
    * merge invariance at 1; retained hash arrays never cross engines. */
  val userTypeOverlap: String =
    s"""WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
       |SELECT a.event_type AS type_a, b.event_type AS type_b,
       |  count(*)::BIGINT AS exact_overlap,
       |  1::BIGINT AS est_ok, 1::BIGINT AS merge_invariant
       |FROM p a JOIN p b ON a.user_id = b.user_id
       |WHERE a.event_type < b.event_type
       |GROUP BY 1, 2""".stripMargin

  /** Repeat-purchase gaps ([[graft.ops.Relational.repeatPurchaseLatency]]):
    * lag over (custkey, orderdate, orderkey), day gaps, one grand row;
    * mean via exact integer division. */
  val repeatPurchaseLatency: String =
    s"""WITH gaps AS (
       |  SELECT o_custkey,
       |    datediff('day',
       |      lag(o_orderdate) OVER (PARTITION BY o_custkey
       |        ORDER BY o_orderdate, o_orderkey),
       |      o_orderdate)::BIGINT AS gap_days
       |  FROM orders)
       |SELECT count(*) AS n_gaps,
       |  count(DISTINCT o_custkey) AS n_repeat_customers,
       |  min(gap_days) AS min_gap_days,
       |  max(gap_days) AS max_gap_days,
       |  ((sum(gap_days) * 1000) // count(*))::BIGINT AS mean_gap_milli_days
       |FROM gaps WHERE gap_days IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------------
  // Correlated-subquery / semi-join shapes. Deliberately written in the
  // CORRELATED / IN / NOT EXISTS form here while the engine ships the
  // decorrelated aggregate+join — agreement proves the rewrite, not just
  // the arithmetic. Shared partsupp analog: min unit cost in millicents
  // per (part, supplier) from lineitem (the schema has no partsupp).
  // ---------------------------------------------------------------------

  /** Q2-shaped min-cost supplier
    * ([[graft.ops.Relational.minCostSupplier]]). */
  val minCostSupplier: String =
    s"""WITH ps AS (
       |  SELECT l_partkey, l_suppkey,
       |    min((round(l_extendedprice * 100)::BIGINT * 1000)
       |        // l_quantity::BIGINT) AS cost_mc
       |  FROM lineitem
       |  WHERE l_suppkey IN (
       |    SELECT s_suppkey FROM supplier, nation, region
       |    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |      AND r_name = 'EUROPE')
       |  GROUP BY 1, 2)
       |SELECT s_name, n_name, p_partkey, p_name, s_acctbal, cost_mc
       |FROM ps, part, supplier, nation
       |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
       |  AND s_nationkey = n_nationkey
       |  AND p_type = 'LARGE' AND p_size >= 40
       |  AND cost_mc = (SELECT min(ps2.cost_mc) FROM ps ps2
       |                 WHERE ps2.l_partkey = ps.l_partkey)""".stripMargin

  /** Q11-shaped important parts ([[graft.ops.Relational.importantParts]]):
    * per-part value through one nation's suppliers vs a global-total
    * scalar subquery, cross-multiplied on integer cents. */
  val importantParts: String =
    s"""WITH perpart AS (
       |  SELECT l_partkey, sum(round(l_extendedprice * 100)::BIGINT)::BIGINT
       |    AS value_c
       |  FROM lineitem
       |  WHERE l_suppkey IN (
       |    SELECT s_suppkey FROM supplier, nation
       |    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_7')
       |  GROUP BY 1)
       |SELECT l_partkey AS partkey, value_c FROM perpart
       |WHERE value_c * 1000 > (SELECT sum(value_c) FROM perpart)""".stripMargin

  /** Q15-shaped top supplier ([[graft.ops.Relational.topSupplier]]):
    * quarterly revenue per supplier, `= (SELECT max(...))`, ties kept. */
  val topSupplier: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |      ::BIGINT AS total_rev_c
       |  FROM lineitem
       |  WHERE l_shipdate >= DATE '1996-01-01'
       |    AND l_shipdate < DATE '1996-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, total_rev_c
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev_c = (SELECT max(total_rev_c) FROM rev)""".stripMargin

  /** Q16-shaped supplier count ([[graft.ops.Relational.supplierCount]]):
    * NOT IN (negative-balance suppliers — the schema has no comment
    * column for Q16's complaints scan) over the distinct link table. */
  val supplierCount: String =
    s"""SELECT p_brand, p_type, p_size,
       |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) links
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
       |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
       |  AND l_suppkey NOT IN (
       |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3""".stripMargin

  /** Q20-shaped excess-stock suppliers
    * ([[graft.ops.Relational.excessSuppliers]]): the nested IN chain —
    * name-filtered parts inside the volume aggregate inside the
    * supplier semi-join. */
  val excessSuppliers: String =
    s"""WITH ps AS (
       |  SELECT l_partkey, l_suppkey, sum(l_quantity::BIGINT) AS hist_qty,
       |    sum(CASE WHEN year(l_shipdate) = 1995
       |        THEN l_quantity::BIGINT ELSE 0 END) AS year_qty
       |  FROM lineitem
       |  WHERE l_partkey IN (
       |    SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
       |  GROUP BY 1, 2)
       |SELECT s_name, s_acctbal
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name = 'NATION_3'
       |  AND s_suppkey IN (SELECT l_suppkey FROM ps
       |                    WHERE year_qty > 0 AND year_qty * 2 < hist_qty)
       |""".stripMargin

  /** Bottom-k sample-quantile sketch QC
    * ([[graft.ops.Windows.valueQuantilesSketch]]): invariants as
    * metrics — the oracle pins the exact row counts and asserts the
    * engine-evaluated 0/1 bounds all hold. */
  val valueQuantilesSketch: String =
    s"""SELECT event_type, count(*)::BIGINT AS n_events,
       |  least(512, count(DISTINCT event_id))::BIGINT AS n_retained,
       |  1::BIGINT AS p50_ok, 1::BIGINT AS p90_ok,
       |  1::BIGINT AS merge_invariant
       |FROM events WHERE value IS NOT NULL GROUP BY 1""".stripMargin

  /** Q9-shaped product-type profit
    * ([[graft.ops.Relational.productProfit]]): revenue minus
    * partsupp-analog supply cost in exact millicents, by nation and
    * order year. */
  val productProfit: String =
    s"""WITH ps AS (
       |  SELECT l_partkey AS pk, l_suppkey AS sk,
       |    min((round(l_extendedprice * 100)::BIGINT * 1000)
       |        // l_quantity::BIGINT) AS cost_mc
       |  FROM lineitem GROUP BY 1, 2)
       |SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |  sum(round(l_extendedprice * (1 - l_discount) * 100000)::BIGINT
       |      - ps.cost_mc * l_quantity::BIGINT)::BIGINT AS profit_mc
       |FROM lineitem, orders, supplier, nation, ps
       |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
       |  AND s_nationkey = n_nationkey
       |  AND ps.pk = l_partkey AND ps.sk = l_suppkey
       |  AND l_partkey IN (
       |    SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
       |GROUP BY 1, 2""".stripMargin

  /** Q12-shaped priority counts by line status
    * ([[graft.ops.Relational.shipPriorityCounts]]). */
  val shipPriorityCounts: String =
    s"""SELECT l_linestatus,
       |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE l_shipdate >= DATE '1996-01-01'
       |  AND l_shipdate < DATE '1997-01-01'
       |GROUP BY 1""".stripMargin

  /** Full CUBE with the grouping bitmask
    * ([[graft.ops.Relational.revenueCube]]) — same bit order contract
    * as [[revenueRollup]]. */
  val revenueCube: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  grouping(l_returnflag, l_linestatus)::BIGINT AS lvl,
       |  count(*)::BIGINT AS n_lines,
       |  sum(round(l_quantity * 100)::BIGINT)::BIGINT AS qty_c,
       |  sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS price_c
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** MERGE-style CDC apply ([[graft.ops.Relational.mergeUpsert]]):
    * the full merge replayed — update/delete/insert resolved through
    * one FULL OUTER join. */
  val mergeUpsert: String =
    s"""WITH t AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
       |    round(c_acctbal * 100)::BIGINT AS bal_c
       |  FROM customer),
       |changes AS (
       |  SELECT CASE WHEN c_custkey % 10 = 2 THEN c_custkey + 1000000
       |    ELSE c_custkey END AS k,
       |    CASE c_custkey % 10 WHEN 0 THEN 'U' WHEN 1 THEN 'D'
       |      ELSE 'I' END AS op,
       |    c_name AS u_name, c_nationkey AS u_nationkey,
       |    CASE WHEN c_custkey % 10 = 2 THEN 'NEW' ELSE c_mktsegment END
       |      AS u_mktsegment,
       |    bal_c + 10000 AS u_bal_c
       |  FROM t WHERE c_custkey % 10 <= 2)
       |SELECT coalesce(k, c_custkey) AS c_custkey,
       |  coalesce(u_name, c_name) AS c_name,
       |  CASE WHEN op = 'I' THEN u_nationkey ELSE c_nationkey END
       |    AS c_nationkey,
       |  CASE WHEN op IN ('I', 'U') THEN u_mktsegment ELSE c_mktsegment END
       |    AS c_mktsegment,
       |  (CASE WHEN op IN ('I', 'U') THEN u_bal_c ELSE bal_c END)::BIGINT
       |    AS bal_c
       |FROM t FULL OUTER JOIN changes ON c_custkey = k
       |WHERE op IS NULL OR op <> 'D'""".stripMargin

  /** Single-pass expectation suite
    * ([[graft.ops.Relational.expectationsReport]]). */
  val expectationsReport: String =
    s"""WITH w AS (
       |  SELECT count(*)::BIGINT AS n_rows,
       |    sum(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL
       |        OR l_suppkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_keys,
       |    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
       |        THEN 1 ELSE 0 END)::BIGINT AS qty_range,
       |    sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
       |        THEN 1 ELSE 0 END)::BIGINT AS discount_range,
       |    sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
       |        THEN 1 ELSE 0 END)::BIGINT AS flag_domain,
       |    sum(CASE WHEN l_linestatus NOT IN ('O', 'F')
       |        THEN 1 ELSE 0 END)::BIGINT AS status_domain,
       |    sum(CASE WHEN l_shipdate < DATE '1995-01-01'
       |        OR l_shipdate >= DATE '2002-01-01'
       |        THEN 1 ELSE 0 END)::BIGINT AS date_range,
       |    (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT
       |      AS dup_line_keys
       |  FROM lineitem),
       |long AS (
       |  SELECT 'null_keys' AS check_name, n_rows,
       |    null_keys AS n_violations FROM w
       |  UNION ALL SELECT 'qty_range', n_rows, qty_range FROM w
       |  UNION ALL SELECT 'discount_range', n_rows, discount_range FROM w
       |  UNION ALL SELECT 'flag_domain', n_rows, flag_domain FROM w
       |  UNION ALL SELECT 'status_domain', n_rows, status_domain FROM w
       |  UNION ALL SELECT 'date_range', n_rows, date_range FROM w
       |  UNION ALL SELECT 'unique_line_keys', n_rows, dup_line_keys FROM w)
       |SELECT check_name, n_rows, n_violations,
       |  (CASE WHEN n_violations = 0 THEN 1 ELSE 0 END)::BIGINT AS pass
       |FROM long""".stripMargin

  /** IVM merge ≡ recompute ([[graft.ops.Windows.incrementalRollup]]):
    * the oracle is the DIRECT recompute over raw events — equality
    * proves the partial-merge maintenance path. */
  val incrementalRollup: String =
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       |  count(*)::BIGINT AS n_events,
       |  sum(coalesce(round(value * 100)::BIGINT, 0))::BIGINT AS value_c
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Last-touch attribution ([[graft.ops.Windows.purchaseAttribution]]):
    * the oracle keeps the correlated max-subquery form; the engine
    * ships the carry-forward window. */
  val purchaseAttribution: String =
    s"""WITH e AS (SELECT event_id, user_id,
       |    floor(epoch(ts))::BIGINT AS sec, event_type FROM events),
       |p AS (SELECT event_id, user_id, sec FROM e
       |      WHERE event_type = 'purchase'),
       |v AS (SELECT user_id, sec FROM e WHERE event_type = 'view')
       |SELECT p.event_id, p.user_id, p.sec AS purchase_sec,
       |  (SELECT max(v.sec) FROM v
       |   WHERE v.user_id = p.user_id AND v.sec <= p.sec
       |     AND v.sec >= p.sec - 604800) AS attributed_view_sec,
       |  p.sec - (SELECT max(v.sec) FROM v
       |   WHERE v.user_id = p.user_id AND v.sec <= p.sec
       |     AND v.sec >= p.sec - 604800) AS delay_sec,
       |  (CASE WHEN (SELECT max(v.sec) FROM v
       |   WHERE v.user_id = p.user_id AND v.sec <= p.sec
       |     AND v.sec >= p.sec - 604800) IS NOT NULL
       |   THEN 1 ELSE 0 END)::BIGINT AS attributed
       |FROM p""".stripMargin

  /** Equi-width price histogram
    * ([[graft.ops.Relational.priceHistogram]]). */
  val priceHistogram: String =
    s"""WITH c AS (
       |  SELECT round(l_extendedprice * 100)::BIGINT AS c FROM lineitem),
       |r AS (SELECT min(c) AS c_min, max(c) AS c_max FROM c)
       |SELECT ((c - c_min) * 32) // (c_max - c_min + 1) AS bucket,
       |  count(*)::BIGINT AS n_rows, sum(c)::BIGINT AS sum_c,
       |  min(c) AS lo_c, max(c) AS hi_c
       |FROM c, r GROUP BY 1""".stripMargin

  /** Supplier scorecard ([[graft.ops.Relational.supplierScorecard]]). */
  val supplierScorecard: String =
    s"""SELECT s_suppkey, s_name, n_name,
       |  count(*)::BIGINT AS n_lines,
       |  sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)
       |    ::BIGINT AS rev_c,
       |  count(DISTINCT l_partkey)::BIGINT AS n_parts,
       |  sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
       |    AS n_returned,
       |  ((1000 * sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END))
       |    // count(*))::BIGINT AS return_pm,
       |  datediff('day', min(l_shipdate), max(l_shipdate))::BIGINT
       |    AS active_days
       |FROM lineitem, supplier, nation
       |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |GROUP BY 1, 2, 3""".stripMargin

  /** Q22-shaped idle wealthy customers
    * ([[graft.ops.Relational.idleCustomers]]): scalar positive-balance
    * average (cross-multiplied, no division) + NOT EXISTS anti-join on
    * orders, grouped by market segment. */
  val idleCustomers: String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_mktsegment,
       |    round(c_acctbal * 100)::BIGINT AS bal_c
       |  FROM customer
       |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')),
       |a AS (SELECT sum(bal_c) AS sum_c, count(*) AS n_pos FROM cust
       |      WHERE bal_c > 0)
       |SELECT c_mktsegment AS segment, count(*)::BIGINT AS numcust,
       |  sum(bal_c)::BIGINT AS totacctbal_c
       |FROM cust, a
       |WHERE bal_c * n_pos > sum_c
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '2000-01-01')
       |GROUP BY 1""".stripMargin

  /** Blocked Jaro-Winkler similarity join over part names
    * ([[graft.ops.Relational.jaroWinklerPairs]]): DuckDB's
    * `jaro_winkler_similarity` replays the engine's native expression
    * (same Winkler 1990 semantics incl. the 0.7 boost threshold,
    * verified value-for-value in JaroWinklerSpec). */
  val jaroWinklerPairs: String =
    s"""WITH p AS (SELECT p_partkey, p_name, p_brand,
       |             substr(p_name, 1, 1) AS blk FROM part)
       |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       |  a.p_name AS name_a, b.p_name AS name_b,
       |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
       |FROM p a JOIN p b
       |  ON a.p_brand = b.p_brand AND a.blk = b.blk
       |  AND a.p_partkey < b.p_partkey
       |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9
       |""".stripMargin

  /** Entity clusters over the Jaro-Winkler pair graph
    * ([[graft.ops.Relational.nameClusters]]): the same blocked JW
    * pair join, then transitive closure via recursive CTE, each
    * clustered part labeled with its component's min partkey —
    * mirroring the engine's large-star/small-star fixpoint, which
    * converges to the same min-reachable-id labeling. */
  val nameClusters: String =
    s"""WITH RECURSIVE p AS (SELECT p_partkey, p_name, p_brand,
       |             substr(p_name, 1, 1) AS blk FROM part),
       |pairs AS (
       |  SELECT a.p_partkey AS u, b.p_partkey AS v
       |  FROM p a JOIN p b
       |    ON a.p_brand = b.p_brand AND a.blk = b.blk
       |    AND a.p_partkey < b.p_partkey
       |  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9),
       |edges AS (SELECT u AS a, v AS b FROM pairs
       |          UNION SELECT v, u FROM pairs),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
       |SELECT src AS p_partkey, least(src, min(dst))::BIGINT AS canonical_key
       |FROM reach GROUP BY src""".stripMargin

  /** Sorted-neighborhood ER ([[graft.ops.Relational.sortedNeighborhoodPairs]]):
    * the oracle computes the SAME global sort rank with a plain
    * `row_number` (tie-broken by key, binary string order on both
    * engines for this ASCII column) and the neighborhood as a direct
    * rank-distance join — the naive single-node statement of exactly
    * the computation the engine distributes (two-phase rank + bucket
    * join). w = 8 ⇒ dist ∈ [1, 7]. */
  val sortedNeighborhoodPairs: String =
    s"""WITH r AS (SELECT p_partkey, p_name,
       |    row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
       |  FROM part)
       |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       |  a.p_name AS name_a, b.p_name AS name_b,
       |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw,
       |  (b.rnk - a.rnk)::BIGINT AS dist
       |FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 7
       |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9
       |""".stripMargin

  /** Blocking-paradigm recall audit
    * ([[graft.ops.Relational.blockingComparison]]): both candidate
    * generators replayed in SQL, pairs canonicalized to
    * (key_lo < key_hi), full outer join → presence-flag groups. */
  val blockingComparison: String =
    s"""WITH r AS (SELECT p_partkey, p_name,
       |    row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
       |  FROM part),
       |snm AS (
       |  SELECT DISTINCT least(a.p_partkey, b.p_partkey) AS key_lo,
       |    greatest(a.p_partkey, b.p_partkey) AS key_hi
       |  FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 7
       |  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9),
       |p AS (SELECT p_partkey, p_name, p_brand,
       |    substr(p_name, 1, 1) AS blk FROM part),
       |kb AS (
       |  SELECT DISTINCT a.p_partkey AS key_lo, b.p_partkey AS key_hi
       |  FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.blk = b.blk
       |    AND a.p_partkey < b.p_partkey
       |  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9)
       |SELECT (CASE WHEN s.key_lo IS NOT NULL THEN 1 ELSE 0 END)::INT
       |    AS in_sorted_neighborhood,
       |  (CASE WHEN k.key_lo IS NOT NULL THEN 1 ELSE 0 END)::INT
       |    AS in_key_blocking,
       |  count(*)::BIGINT AS n_pairs
       |FROM snm s FULL OUTER JOIN kb k
       |  ON s.key_lo = k.key_lo AND s.key_hi = k.key_hi
       |GROUP BY 1, 2""".stripMargin

  /** Multi-pass SNM ([[graft.ops.Relational.sortedNeighborhoodMultipass]]):
    * both passes replayed as plain `row_number` windows (forward key =
    * name, reverse key = token-reversed name), pairs canonicalized,
    * full outer join → per-pass provenance flags. */
  val sortedNeighborhoodMultipass: String =
    s"""WITH p AS (SELECT p_partkey, p_name FROM part),
       |f AS (SELECT p_partkey, p_name,
       |    row_number() OVER (ORDER BY p_name, p_partkey) AS rnk FROM p),
       |fp AS (SELECT DISTINCT least(a.p_partkey, b.p_partkey) AS key_a,
       |    greatest(a.p_partkey, b.p_partkey) AS key_b
       |  FROM f a JOIN f b ON b.rnk - a.rnk BETWEEN 1 AND 7
       |  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9),
       |r AS (SELECT p_partkey, p_name,
       |    array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
       |      AS skey FROM p),
       |r2 AS (SELECT p_partkey, p_name,
       |    row_number() OVER (ORDER BY skey, p_partkey) AS rnk FROM r),
       |rp AS (SELECT DISTINCT least(a.p_partkey, b.p_partkey) AS key_a,
       |    greatest(a.p_partkey, b.p_partkey) AS key_b
       |  FROM r2 a JOIN r2 b ON b.rnk - a.rnk BETWEEN 1 AND 7
       |  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9)
       |SELECT coalesce(f.key_a, rr.key_a) AS key_a,
       |  coalesce(f.key_b, rr.key_b) AS key_b,
       |  (CASE WHEN f.key_a IS NOT NULL THEN 1 ELSE 0 END)::INT AS in_fwd,
       |  (CASE WHEN rr.key_a IS NOT NULL THEN 1 ELSE 0 END)::INT AS in_rev
       |FROM fp f FULL OUTER JOIN rp rr
       |  ON f.key_a = rr.key_a AND f.key_b = rr.key_b""".stripMargin

  /** Row-level Unicode canonicalization
    * ([[graft.llm.TextAnalysis.canonicalizedNames]]): chr(233) is the
    * precomposed é, chr(769) the combining acute — DuckDB's
    * `strip_accents`/`nfc_normalize` replay the engine's native
    * expressions (semantics pinned in UnicodeNormSpec). */
  val canonicalizedNames: String =
    s"""WITH s AS (SELECT s_suppkey,
       |    replace(s_name, 'e', chr(233)) AS accented,
       |    replace(s_name, 'e', 'e' || chr(769)) AS dec
       |  FROM supplier)
       |SELECT s_suppkey, accented,
       |  strip_accents(accented) AS folded,
       |  (CASE WHEN nfc_normalize(dec) = accented THEN 1 ELSE 0 END)::INT
       |    AS composed_ok
       |FROM s""".stripMargin

  /** Value/recency skyline ([[graft.ops.Skyline.paretoOrders]]): the
    * oracle runs the classic SINGLE-PASS sorted algorithm — collapse
    * to per-price max date, one x-desc window keeping the strict
    * running max, keep buckets that beat it — i.e. the exact global
    * computation the engine's two-phase range-partitioned prefix scan
    * distributes. Same math, opposite physical plan: agreement pins
    * the distribution logic, not just the dominance arithmetic. */
  val paretoOrders: String =
    s"""WITH b AS (
       |  SELECT o_totalprice AS x, max(o_orderdate) AS maxy
       |  FROM orders GROUP BY 1),
       |f AS (
       |  SELECT x, maxy, max(maxy) OVER (ORDER BY x DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sm
       |  FROM b)
       |SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
       |FROM orders o
       |JOIN f ON o.o_totalprice = f.x AND o.o_orderdate = f.maxy
       |WHERE f.sm IS NULL OR f.sm < f.maxy""".stripMargin

  /** Count-Min point-frequency QC
    * ([[graft.ops.Relational.cmsPartCounts]]): every sketch cell is
    * rebuilt with the same affine hashes
    * `((a·(k mod⁺ P) + b) % P) % 512`, P = 2^31−1, in plain integer
    * SQL, so the estimates cross engines exactly. The key reduces
    * mod⁺ P FIRST (`(k % P + P) % P` — DuckDB's `%` keeps the
    * dividend's sign, so the double-mod is the floor-mod spelling),
    * mirroring the engine's overflow-free round-13 hash: congruent for
    * every key below P (all TPC-H keys — identical cells to the old
    * form) and overflow-free over the whole BIGINT domain, where the
    * pre-r13 `a·k` raised a DuckDB overflow error for |k| ≥ ~2^39. */
  val cmsPartCounts: String =
    s"""WITH h AS (SELECT * FROM (VALUES (0, 1299721, 7), (1, 104729, 13),
       |             (2, 15485863, 31)) t(i, a, b)),
       |cells AS (
       |  SELECT h.i AS i,
       |    ((h.a * ((l.l_partkey % 2147483647 + 2147483647) % 2147483647)
       |      + h.b) % 2147483647) % 512 AS bkt,
       |    count(*)::BIGINT AS c
       |  FROM lineitem l CROSS JOIN h GROUP BY 1, 2),
       |keys AS (SELECT l_partkey, count(*)::BIGINT AS cnt
       |         FROM lineitem GROUP BY 1)
       |SELECT k.l_partkey, any_value(k.cnt) AS cnt,
       |  min(c.c)::BIGINT AS est,
       |  min(c.c)::BIGINT - any_value(k.cnt) AS overcount
       |FROM keys k CROSS JOIN h
       |JOIN cells c ON c.i = h.i
       |  AND c.bkt = ((h.a * ((k.l_partkey % 2147483647 + 2147483647)
       |                       % 2147483647) + h.b) % 2147483647) % 512
       |GROUP BY 1""".stripMargin

  /** Bounded multi-source BFS over the supply graph
    * ([[graft.ops.Graph.bfsSupply]]), unrolled: hop h's frontier joins
    * the previous hop's NEW nodes and anti-filters everything already
    * visited — the same frontier/anti-join algebra the engine
    * iterates, as plain CTEs. */
  val bfsSupply: String = {
    def hop(h: Int): String =
      s"""l$h AS (SELECT DISTINCT e.dst AS node
         |  FROM edges e JOIN l${h - 1} ON l${h - 1}.node = e.src
         |  WHERE e.dst NOT IN (SELECT node FROM v${h - 1})),
         |v$h AS (SELECT * FROM v${h - 1}
         |        UNION ALL SELECT node, $h AS level FROM l$h)"""
    s"""WITH pairs AS (SELECT DISTINCT l_suppkey AS s,
       |                 10000000 + l_partkey AS p FROM lineitem),
       |edges AS (SELECT s AS src, p AS dst FROM pairs
       |          UNION ALL SELECT p, s FROM pairs),
       |l0 AS (SELECT DISTINCT s_suppkey AS node FROM supplier
       |       WHERE s_nationkey = 0),
       |v0 AS (SELECT node, 0 AS level FROM l0),
       |${hop(1)},
       |${hop(2)},
       |${hop(3)},
       |${hop(4)}
       |SELECT level::BIGINT AS level, count(*)::BIGINT AS n_nodes
       |FROM v4 GROUP BY 1""".stripMargin
  }

  /** 3-iteration PageRank over the bipartite supply graph
    * ([[graft.ops.Graph.pagerankSupply]]), unrolled: each iteration is
    * one join + group-by, the exact relational algebra the engine
    * runs — only the 1e9-scaled integer ranks cross engines. */
  val pagerankSupply: String = {
    def step(prev: String, next: String): String =
      s"""$next AS (
         |  SELECT e.dst AS node,
         |    (SELECT 0.15 / n FROM nn) +
         |      0.85 * sum(r.rank / d.outdeg) AS rank
         |  FROM edges e
         |  JOIN deg d ON d.src = e.src
         |  JOIN $prev r ON r.node = e.src
         |  GROUP BY e.dst)"""
    s"""WITH pairs AS (SELECT DISTINCT l_suppkey AS s,
       |                 10000000 + l_partkey AS p FROM lineitem),
       |edges AS (SELECT s AS src, p AS dst FROM pairs
       |          UNION ALL SELECT p, s FROM pairs),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
       |r0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS rank FROM nodes),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT node, round(rank * 1000000000)::BIGINT AS rank_e9
       |FROM r3""".stripMargin
  }

  /** 3-iteration PERSONALIZED PageRank
    * ([[graft.ops.Graph.pprSupply]]), unrolled like the uniform
    * oracle; the teleport weight rides the node relation (`sw`) and
    * each step's per-node term is `0.15·s(v) + 0.85·inflow(v)` — the
    * bipartite supply graph has no dangling nodes, so the DM·s(v)
    * term is identically zero and stays out of both plans. The LEFT
    * join keeps zero-inflow nodes (unreached at iteration i), whose
    * rank is the bare teleport term — 0 off the seed support. */
  val pprSupply: String = {
    def step(prev: String, next: String): String =
      s"""$next AS (
         |  SELECT sw.node,
         |    0.15 * sw.s + 0.85 * coalesce(agg.inflow, 0) AS rank
         |  FROM sw LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / d.outdeg) AS inflow
         |    FROM edges e
         |    JOIN deg d ON d.src = e.src
         |    JOIN $prev r ON r.node = e.src
         |    GROUP BY e.dst) agg ON agg.node = sw.node)"""
    s"""WITH pairs AS (SELECT DISTINCT l_suppkey AS s,
       |                 10000000 + l_partkey AS p FROM lineitem),
       |edges AS (SELECT s AS src, p AS dst FROM pairs
       |          UNION ALL SELECT p, s FROM pairs),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |seeds AS (SELECT DISTINCT s_suppkey::BIGINT AS node FROM supplier
       |          WHERE s_suppkey % 10 = 1),
       |ns AS (SELECT count(*)::DOUBLE AS k FROM seeds),
       |sw AS (SELECT n.node,
       |         CASE WHEN s.node IS NOT NULL THEN (SELECT 1.0 / k FROM ns)
       |              ELSE 0.0 END AS s
       |       FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
       |r0 AS (SELECT node, s AS rank FROM sw),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT node, round(rank * 1000000000)::BIGINT AS rank_e9
       |FROM r3""".stripMargin
  }
}
