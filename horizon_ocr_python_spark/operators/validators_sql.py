"""Validators as Catalyst expressions (SURVEY §2.6: "pure scalar functions —
all SQL/UDF-expressible, ideal DuckDB-oracle targets").

Each mirrors a kernel validator on deterministic values derived from the
sf tables, so the oracle checks the exact predicate/normalization logic:

v1 amount roundtrip:   EU-format string -> parse -> double (validators.py:96-130)
v2 total check:        |total - sum(items)| <= 0.01 (validators.py:132-176)
v3 date normalize:     dd/MM/yyyy -> ISO via to_date (validators.py:191-212)
v4 currency:           symbol map + ISO-4217 membership (validators.py:294-344)
v5 regex:              invoice-number pattern (validators.py:354-361)
r3 font bins:          threshold bucketing (io/reconstruction.py:100-118)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import table


def v1_amount_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render each lineitem price as a European decimal-comma string, then
    parse it back with the V1 separator rules. parsed == original proves the
    disambiguation logic (validators.py:110-125) as pure expressions."""
    li = table(spark, sf_dir, "lineitem")
    eu_str = F.replace(F.format_string("%.2f", F.col("l_extendedprice")),
                       F.lit("."), F.lit(","))
    parsed = F.replace(F.col("amount_eu"), F.lit(","), F.lit(".")).cast("double")
    return (li.select("l_orderkey", "l_linenumber", eu_str.alias("amount_eu"))
            .withColumn("parsed", parsed)
            .withColumn("roundtrip_ok",
                        (F.abs(F.col("parsed")
                               - F.round(F.col("parsed"), 2)) < 1e-9))
            .orderBy("l_orderkey", "l_linenumber"))


V1_AMOUNT_ROUNDTRIP_SQL = """
WITH rendered AS (
  SELECT l_orderkey, l_linenumber,
         replace(printf('%.2f', l_extendedprice), '.', ',') AS amount_eu
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, amount_eu,
       CAST(replace(amount_eu, ',', '.') AS DOUBLE) AS parsed,
       abs(CAST(replace(amount_eu, ',', '.') AS DOUBLE)
           - round(CAST(replace(amount_eu, ',', '.') AS DOUBLE), 2)) < 1e-9
         AS roundtrip_ok
FROM rendered
ORDER BY l_orderkey, l_linenumber
"""


def v2_total_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field total consistency at dataset scale: per order, does
    o_totalprice match the sum of line charges within tolerance? The exact
    V2 predicate |total - calculated| <= 0.01 (validators.py:153-155).

    Sums rounded to 2dp before comparison so the verdict is independent of
    floating-point summation order across engines."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    charges = (li.groupBy("l_orderkey")
               .agg(F.round(F.sum(F.col("l_extendedprice")
                                  * (1 - F.col("l_discount"))
                                  * (1 + F.col("l_tax"))), 2).alias("calculated")))
    return (orders.join(charges, orders.o_orderkey == charges.l_orderkey)
            .select(F.col("o_orderkey").alias("orderkey"),
                    F.round("o_totalprice", 2).alias("total"),
                    "calculated",
                    (F.abs(F.round(F.col("o_totalprice") - F.col("calculated"), 2))
                     <= 0.01).alias("passed"))
            .orderBy("orderkey"))


V2_TOTAL_CHECK_SQL = """
WITH charges AS (
  SELECT l_orderkey,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           AS calculated
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey AS orderkey, round(o_totalprice, 2) AS total, calculated,
       abs(round(o_totalprice - calculated, 2)) <= 0.01 AS passed
FROM orders JOIN charges ON o_orderkey = l_orderkey
ORDER BY orderkey
"""


def v3_date_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: event timestamps rendered as dd/MM/yyyy, parsed back with
    the multi-format coalesce (the expression form of the 18-format loop,
    validators.py:191-212), normalized to ISO."""
    ev = table(spark, sf_dir, "events")
    rendered = F.date_format(F.col("ts"), "dd/MM/yyyy")
    # try_to_date: ANSI-safe per-format attempt, exactly the reference's
    # try-next-format loop semantics (validators.py:262-279)
    parsed = F.coalesce(
        F.try_to_date(F.col("date_str"), "yyyy-MM-dd"),
        F.try_to_date(F.col("date_str"), "dd/MM/yyyy"),
        F.try_to_date(F.col("date_str"), "yyyy/MM/dd"),
    )
    return (ev.select("event_id", rendered.alias("date_str"))
            .withColumn("iso_date", F.date_format(parsed, "yyyy-MM-dd"))
            .orderBy("event_id"))


V3_DATE_NORMALIZE_SQL = """
WITH rendered AS (
  SELECT event_id, strftime(ts, '%d/%m/%Y') AS date_str FROM events
)
SELECT event_id, date_str,
       strftime(coalesce(
         try_strptime(date_str, '%Y-%m-%d'),
         try_strptime(date_str, '%d/%m/%Y'),
         try_strptime(date_str, '%Y/%m/%d')), '%Y-%m-%d') AS iso_date
FROM rendered
ORDER BY event_id
"""


_CURRENCY_CASES = [
    (0, "USD"), (1, "EUR"), (2, "XXX"), (3, "GBP"),
    (4, "usd"), (5, "$"), (6, "JPY"), (7, "ZZ"),
]
_VALID = ("USD", "EUR", "GBP", "JPY", "CAD", "AUD", "CHF", "CNY",
          "INR", "MXN", "BRL", "KRW", "SGD", "HKD", "NOK", "SEK",
          "DKK", "NZD", "ZAR", "RUB", "TRY", "PLN", "THB", "MYR",
          "IDR", "PHP", "CZK", "ILS", "CLP", "PKR", "AED", "SAR")


def v4_currency_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol map + ISO-4217 membership over deterministic per-customer
    codes (validators.py:311-344)."""
    cust = table(spark, sf_dir, "customer")
    code = F.col("c_custkey") % 8
    raw = F.lit(None).cast("string")
    for k, v in reversed(_CURRENCY_CASES):
        raw = F.when(code == k, v).otherwise(raw)
    norm = F.upper(F.trim(raw))
    norm = (F.when(norm == "$", "USD").when(norm == "€", "EUR")
            .when(norm == "£", "GBP").when(norm == "¥", "JPY")
            .when(norm == "₹", "INR").when(norm == "₽", "RUB")
            .when(norm == "₩", "KRW").otherwise(norm))
    return (cust.select("c_custkey", raw.alias("raw_code"),
                        norm.alias("norm_code"),
                        norm.isin(*_VALID).alias("passed"))
            .orderBy("c_custkey"))


V4_CURRENCY_VALIDATE_SQL = f"""
WITH coded AS (
  SELECT c_custkey,
    CASE c_custkey % 8
      {" ".join(f"WHEN {k} THEN '{v}'" for k, v in _CURRENCY_CASES)}
    END AS raw_code
  FROM customer
), normed AS (
  SELECT c_custkey, raw_code,
    CASE upper(trim(raw_code))
      WHEN '$' THEN 'USD' WHEN '€' THEN 'EUR' WHEN '£' THEN 'GBP'
      WHEN '¥' THEN 'JPY' WHEN '₹' THEN 'INR' WHEN '₽' THEN 'RUB'
      WHEN '₩' THEN 'KRW' ELSE upper(trim(raw_code)) END AS norm_code
  FROM coded
)
SELECT c_custkey, raw_code, norm_code,
       norm_code IN ({", ".join(f"'{c}'" for c in _VALID)}) AS passed
FROM normed
ORDER BY c_custkey
"""


_INVOICE_RE = r"^[A-Za-z0-9#][A-Za-z0-9_\-/.# ]{1,40}$"


def v5_regex_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invoice-number regex (validators.py:355) over synthesized ids —
    every 7th is deliberately malformed."""
    docs = table(spark, sf_dir, "documents")
    value = (F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit("!!bad-"),
                                                       F.col("doc_id").cast("string")))
             .otherwise(F.concat(F.lit("INV-2026/"), F.col("doc_id").cast("string"))))
    return (docs.select("doc_id", value.alias("invoice_no"))
            .withColumn("passed", F.col("invoice_no").rlike(_INVOICE_RE))
            .orderBy("doc_id"))


V5_REGEX_VALIDATE_SQL = rf"""
WITH vals AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN '!!bad-' || CAST(doc_id AS VARCHAR)
         ELSE 'INV-2026/' || CAST(doc_id AS VARCHAR) END AS invoice_no
  FROM documents
)
SELECT doc_id, invoice_no,
       regexp_matches(invoice_no, '{_INVOICE_RE}') AS passed
FROM vals
ORDER BY doc_id
"""


def r3_font_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold bucketing (>=80 title / >=50 large / >=30 normal / small,
    io/reconstruction.py:100-118) over part sizes."""
    part = table(spark, sf_dir, "part")
    bin_ = (F.when(F.col("p_size") >= 40, "title")
            .when(F.col("p_size") >= 25, "large")
            .when(F.col("p_size") >= 10, "normal")
            .otherwise("small"))
    return (part.select("p_partkey", "p_size", bin_.alias("size_bin"))
            .orderBy("p_partkey"))


R3_FONT_BINS_SQL = """
SELECT p_partkey, p_size,
  CASE WHEN p_size >= 40 THEN 'title'
       WHEN p_size >= 25 THEN 'large'
       WHEN p_size >= 10 THEN 'normal'
       ELSE 'small' END AS size_bin
FROM part
ORDER BY p_partkey
"""
