-- Flagship channel report as ONE SQL statement over the `--step sql`
-- views (conversions / sessions / session_costs) — the Spark-dialect
-- twin of the DuckDB oracle in AttributionQueries.flagshipSql. The only
-- dialect difference: timestamps here are the engine's canonical
-- epoch-nanos BIGINT, so date extraction goes through
-- date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd').
--
--   graft.Main --step sql --data-dir <sfdir> --out-dir <out> \
--     --query sql/flagship_report.sql
WITH journeys AS (
  SELECT c.conv_id AS conversion_id, s.session_id, s.ts,
         s.channel_name AS channel_label,
         s.holder_engagement, s.closer_engagement,
         CAST(0 AS BIGINT) AS conversion, s.impression_interaction,
         c.conv_ts, c.revenue
  FROM conversions c JOIN sessions s
    ON c.user_id = s.user_id AND s.ts <= c.conv_ts
), journey_raw AS (
  SELECT *, 4 + (CASE WHEN rn = 1 THEN 6 ELSE 0 END)
              + (CASE WHEN rn = n THEN 8 ELSE 0 END)
              + 2 * holder_engagement
              + impression_interaction
              + (CASE WHEN rn = n THEN 3 ELSE 0 END) * closer_engagement AS raw
  FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY conversion_id ORDER BY ts, session_id) AS rn,
           COUNT(*) OVER (PARTITION BY conversion_id) AS n
    FROM journeys) jp
), scored AS (
  SELECT conversion_id, session_id,
         CAST(raw AS DOUBLE) / CAST(SUM(raw) OVER (PARTITION BY conversion_id) AS DOUBLE) AS ihc
  FROM journey_raw
), session_data AS (
  SELECT s.session_id, s.user_id, s.ts, s.channel_name,
         date_format(timestamp_micros(s.ts div 1000), 'yyyy-MM-dd') AS date,
         COALESCE(c.cost, CAST(0 AS DOUBLE)) AS cost
  FROM sessions s LEFT JOIN session_costs c ON s.session_id = c.session_id
)
SELECT channel_name, date, cost, ihc, ihc_revenue,
       COALESCE(cost / NULLIF(ihc, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)) AS CPO,
       COALESCE(ihc_revenue / NULLIF(cost, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)) AS ROAS
FROM (
  SELECT sd.channel_name, sd.date,
         SIGN(SUM(sd.cost)) * (FLOOR(ABS(SUM(sd.cost)) * 1e2 + 0.5) / 1e2) AS cost,
         SIGN(SUM(a.ihc)) * (FLOOR(ABS(SUM(a.ihc)) * 1e4 + 0.5) / 1e4) AS ihc,
         SIGN(SUM(a.ihc * cv.revenue))
           * (FLOOR(ABS(SUM(a.ihc * cv.revenue)) * 1e2 + 0.5) / 1e2) AS ihc_revenue
  FROM session_data sd
  JOIN scored a ON sd.session_id = a.session_id
  JOIN conversions cv ON a.conversion_id = cv.conv_id
  GROUP BY 1, 2
) r
