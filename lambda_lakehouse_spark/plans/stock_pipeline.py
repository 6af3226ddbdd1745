"""Reference-parity stock pipeline: raw CSV → stg contract → star schema.

This is the user-facing pipeline API — a user of the reference who
today submits ``airflow/dags/spark_code/{stg,curated}/*.py`` jobs
switches to these functions. Each function cites the reference job it
re-expresses (file:line into /root/reference/); orchestration honors
the DAG fan-in (``airflow/dags/lakehouse_dags.py:100-170``:
stg per country → 5 dims in parallel → fact last).

Scale posture: stg is a narrow projection (no shuffle); each dim is
one distinct/groupBy shuffle over the stg subset of its columns; the
fact assembly broadcasts every dim (dims are small by construction —
days, exchanges, currencies, statuses, company versions) so the fact
scan never shuffles. Writes are dynamic partition overwrites, so any
(country, day) batch is re-runnable (``utils/init_spark.py:92-109``
semantics with errors raised, not swallowed — SURVEY G1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_lakehouse_spark.functions.scalar import (
    as_double_clean,
    as_long_clean,
    date_sk,
    norm_sym,
    sk_crc32,
)
from lambda_lakehouse_spark.operators.align import align_to_contract
from lambda_lakehouse_spark.operators.scd2 import build_scd2
from lambda_lakehouse_spark.operators.temporal import pit_join
from lambda_lakehouse_spark.sources.writer import write_partitioned

# The 25-column staging contract (``utils/init_spark.py:116-131``;
# FIXTURES.md §2). ``company_name_jp`` is intentionally absent —
# production drops it (SURVEY G4).
STG_CONTRACT: list[tuple[str, str]] = [
    ("symbol", "string"),
    ("country", "string"),
    ("datadate", "date"),
    ("company_name", "string"),
    ("sector", "string"),
    ("industry", "string"),
    ("website", "string"),
    ("employees", "long"),
    ("market_cap", "double"),
    ("currency", "string"),
    ("exchange", "string"),
    ("current_price", "double"),
    ("previous_close", "double"),
    ("ceiling", "double"),
    ("floor", "double"),
    ("ref_price", "double"),
    ("trading_status", "string"),
    ("trading_status_code", "string"),
    ("trading_status_group", "string"),
    ("foreign_percent", "double"),
    ("outstanding_share", "long"),
    ("issue_share", "long"),
    ("delta_in_week", "double"),
    ("delta_in_month", "double"),
    ("delta_in_year", "double"),
    ("avg_match_vol_2w", "long"),
]

# Seed data (SURVEY G9): currency display names (reference builds the
# list from pycountry + a manual VND append, ``dim_currency.py:60-66``;
# pycountry is unavailable here, so the active ISO 4217 table — public
# standard data — is seeded inline) and hard-coded FX-to-VND rates
# (``dim_currency.py:77-82``).
CURRENCY_NAMES: list[tuple[str, str]] = [
    ("AED", "UAE Dirham"), ("AFN", "Afghani"), ("ALL", "Lek"),
    ("AMD", "Armenian Dram"), ("ANG", "Netherlands Antillean Guilder"),
    ("AOA", "Kwanza"), ("ARS", "Argentine Peso"), ("AUD", "Australian Dollar"),
    ("AWG", "Aruban Florin"), ("AZN", "Azerbaijan Manat"),
    ("BAM", "Convertible Mark"), ("BBD", "Barbados Dollar"), ("BDT", "Taka"),
    ("BGN", "Bulgarian Lev"), ("BHD", "Bahraini Dinar"), ("BIF", "Burundi Franc"),
    ("BMD", "Bermudian Dollar"), ("BND", "Brunei Dollar"), ("BOB", "Boliviano"),
    ("BRL", "Brazilian Real"), ("BSD", "Bahamian Dollar"), ("BTN", "Ngultrum"),
    ("BWP", "Pula"), ("BYN", "Belarusian Ruble"), ("BZD", "Belize Dollar"),
    ("CAD", "Canadian Dollar"), ("CDF", "Congolese Franc"), ("CHF", "Swiss Franc"),
    ("CLP", "Chilean Peso"), ("CNY", "Yuan Renminbi"), ("COP", "Colombian Peso"),
    ("CRC", "Costa Rican Colon"), ("CUP", "Cuban Peso"),
    ("CVE", "Cabo Verde Escudo"), ("CZK", "Czech Koruna"),
    ("DJF", "Djibouti Franc"), ("DKK", "Danish Krone"), ("DOP", "Dominican Peso"),
    ("DZD", "Algerian Dinar"), ("EGP", "Egyptian Pound"), ("ERN", "Nakfa"),
    ("ETB", "Ethiopian Birr"), ("EUR", "Euro"), ("FJD", "Fiji Dollar"),
    ("FKP", "Falkland Islands Pound"), ("GBP", "Pound Sterling"), ("GEL", "Lari"),
    ("GHS", "Ghana Cedi"), ("GIP", "Gibraltar Pound"), ("GMD", "Dalasi"),
    ("GNF", "Guinean Franc"), ("GTQ", "Quetzal"), ("GYD", "Guyana Dollar"),
    ("HKD", "Hong Kong Dollar"), ("HNL", "Lempira"), ("HTG", "Gourde"),
    ("HUF", "Forint"), ("IDR", "Rupiah"), ("ILS", "New Israeli Sheqel"),
    ("INR", "Indian Rupee"), ("IQD", "Iraqi Dinar"), ("IRR", "Iranian Rial"),
    ("ISK", "Iceland Krona"), ("JMD", "Jamaican Dollar"), ("JOD", "Jordanian Dinar"),
    ("JPY", "Japanese Yen"), ("KES", "Kenyan Shilling"), ("KGS", "Som"),
    ("KHR", "Riel"), ("KMF", "Comorian Franc"), ("KPW", "North Korean Won"),
    ("KRW", "Won"), ("KWD", "Kuwaiti Dinar"), ("KYD", "Cayman Islands Dollar"),
    ("KZT", "Tenge"), ("LAK", "Lao Kip"), ("LBP", "Lebanese Pound"),
    ("LKR", "Sri Lanka Rupee"), ("LRD", "Liberian Dollar"), ("LSL", "Loti"),
    ("LYD", "Libyan Dinar"), ("MAD", "Moroccan Dirham"), ("MDL", "Moldovan Leu"),
    ("MGA", "Malagasy Ariary"), ("MKD", "Denar"), ("MMK", "Kyat"),
    ("MNT", "Tugrik"), ("MOP", "Pataca"), ("MRU", "Ouguiya"),
    ("MUR", "Mauritius Rupee"), ("MVR", "Rufiyaa"), ("MWK", "Malawi Kwacha"),
    ("MXN", "Mexican Peso"), ("MYR", "Malaysian Ringgit"),
    ("MZN", "Mozambique Metical"), ("NAD", "Namibia Dollar"), ("NGN", "Naira"),
    ("NIO", "Cordoba Oro"), ("NOK", "Norwegian Krone"), ("NPR", "Nepalese Rupee"),
    ("NZD", "New Zealand Dollar"), ("OMR", "Rial Omani"), ("PAB", "Balboa"),
    ("PEN", "Sol"), ("PGK", "Kina"), ("PHP", "Philippine Peso"),
    ("PKR", "Pakistan Rupee"), ("PLN", "Zloty"), ("PYG", "Guarani"),
    ("QAR", "Qatari Rial"), ("RON", "Romanian Leu"), ("RSD", "Serbian Dinar"),
    ("RUB", "Russian Ruble"), ("RWF", "Rwanda Franc"), ("SAR", "Saudi Riyal"),
    ("SBD", "Solomon Islands Dollar"), ("SCR", "Seychelles Rupee"),
    ("SDG", "Sudanese Pound"), ("SEK", "Swedish Krona"),
    ("SGD", "Singapore Dollar"), ("SHP", "Saint Helena Pound"),
    ("SLE", "Leone"), ("SOS", "Somali Shilling"), ("SRD", "Surinam Dollar"),
    ("SSP", "South Sudanese Pound"), ("STN", "Dobra"),
    ("SVC", "El Salvador Colon"), ("SYP", "Syrian Pound"), ("SZL", "Lilangeni"),
    ("THB", "Baht"), ("TJS", "Somoni"), ("TMT", "Turkmenistan New Manat"),
    ("TND", "Tunisian Dinar"), ("TOP", "Pa'anga"), ("TRY", "Turkish Lira"),
    ("TTD", "Trinidad and Tobago Dollar"), ("TWD", "New Taiwan Dollar"),
    ("TZS", "Tanzanian Shilling"), ("UAH", "Hryvnia"), ("UGX", "Uganda Shilling"),
    ("USD", "US Dollar"), ("UYU", "Peso Uruguayo"), ("UZS", "Uzbekistan Sum"),
    ("VES", "Bolivar Soberano"), ("VND", "Vietnamese Dong"), ("VUV", "Vatu"),
    ("WST", "Tala"), ("XAF", "CFA Franc BEAC"), ("XCD", "East Caribbean Dollar"),
    ("XOF", "CFA Franc BCEAO"), ("XPF", "CFP Franc"), ("YER", "Yemeni Rial"),
    ("ZAR", "Rand"), ("ZMW", "Zambian Kwacha"), ("ZWG", "Zimbabwe Gold"),
]
FX_RATES_VND: list[tuple[str, float]] = [
    ("VND", 1.0),
    ("USD", 25000.0),
    ("JPY", 170.0),
]

def _valid_symbol():
    return F.col("symbol").isNotNull() & (F.col("symbol") != "")


def stg_vn(raw: DataFrame, batch_date: str) -> DataFrame:
    """VN staging job (``vn_stg_processing.py:64-123``).

    VN *stamps* ``datadate`` from the batch parameter (SURVEY G7,
    ``:67``) instead of parsing it; prices arrive dirty (thousands
    separators, currency suffixes) and are regex-cleaned; the exchange
    comes from either of two ingest-merge columns (``:87-89``);
    ``outstanding_share`` is stored in millions and scaled (G6 — the
    product stays double until the contract recasts to long).
    """
    cur = as_double_clean("ref_price")
    prev = as_double_clean("prior_close_price")
    df = (
        raw.withColumn("symbol", norm_sym("symbol"))
        .where(_valid_symbol())
        .withColumn("country", F.lit("VN"))
        .withColumn("datadate", F.lit(batch_date).cast("date"))
        .withColumn("sector", F.col("industry"))
        .withColumn("employees", as_long_clean("no_employees"))
        # current_price/price_source MUST be derived before ref_price is
        # replaced below: `cur` references the raw "ref_price" column,
        # and re-cleaning an already-cleaned double corrupts it (the
        # scientific-notation 'E' of large doubles gets regex-stripped)
        .withColumn("current_price", F.coalesce(cur, prev))
        .withColumn(
            "price_source",
            F.when(cur.isNotNull(), F.lit("ref"))
            .when(prev.isNotNull(), F.lit("prior_close"))
            .otherwise(F.lit(None).cast("string")),
        )
        .withColumn("ref_price", cur)
        .withColumn("previous_close", prev)
        .withColumn("ceiling", as_double_clean("ceiling"))
        .withColumn("floor", as_double_clean("floor"))
        .withColumn("foreign_percent", as_double_clean("foreign_percent"))
        .withColumn("delta_in_week", as_double_clean("delta_in_week"))
        .withColumn("delta_in_month", as_double_clean("delta_in_month"))
        .withColumn("delta_in_year", as_double_clean("delta_in_year"))
        .withColumn("avg_match_vol_2w", as_long_clean("average_match_volume2_week"))
        .withColumn(
            "outstanding_share",
            F.col("outstanding_share").cast("double") * F.lit(1_000_000),
        )
        .withColumn("issue_share", as_long_clean("issue_share"))
        .withColumn(
            "exchange", F.coalesce(F.col("exchange_overview"), F.col("exchange_price"))
        )
        .withColumn("currency", F.lit("VND"))
        # price_source is computed (above) then dropped by the contract — G4
        .withColumn(
            "market_cap", F.col("outstanding_share") * F.col("current_price")
        )
    )
    return align_to_contract(df, STG_CONTRACT)


def stg_us(raw: DataFrame, batch_date: str) -> DataFrame:
    """US staging job (``us_stg_processing.py:60-89``): ``datadate``
    parsed from the data (``to_date``, ``:68``), numerics cleaned,
    exchange left NULL (``:76``)."""
    df = (
        raw.withColumn("symbol", norm_sym("symbol"))
        .where(_valid_symbol())
        .withColumn("country", F.lit("US"))
        .withColumn("datadate", F.to_date("datadate"))
        .withColumn("employees", as_long_clean("full_time_employees"))
        .withColumn("market_cap", as_double_clean("market_cap"))
        .withColumn("current_price", as_double_clean("current_price"))
        .withColumn("previous_close", as_double_clean("previous_close"))
        .withColumn("exchange", F.lit(None).cast("string"))
    )
    return align_to_contract(df, STG_CONTRACT)


def stg_jp(raw: DataFrame, batch_date: str) -> DataFrame:
    """JP staging job (``jp_stg_processing.py:60-89``): symbol from
    ``ticker`` (numeric-looking codes), exchange provided by the
    source; ``company_name_jp`` is dropped by the contract (G4)."""
    df = (
        raw.withColumn("symbol", norm_sym("ticker"))
        .where(_valid_symbol())
        .withColumn("country", F.lit("JP"))
        .withColumn("datadate", F.to_date("datadate"))
        .withColumn("employees", as_long_clean("employees"))
        .withColumn("market_cap", as_double_clean("market_cap"))
        .withColumn("current_price", as_double_clean("current_price"))
        .withColumn("previous_close", as_double_clean("previous_close"))
        .withColumn("currency", F.lit("JPY"))
    )
    return align_to_contract(df, STG_CONTRACT)


def dim_date(stg: DataFrame) -> DataFrame:
    """Calendar dimension (``curated/dim_date.py:56-80``): distinct
    datadates → smart key + calendar parts; weekend = Sun/Sat
    (``dayofweek`` 1/7, ``:72``)."""
    return (
        stg.select(F.col("datadate").alias("date"))
        .where(F.col("date").isNotNull())
        .distinct()
        .select(
            date_sk("date").alias("date_sk"),
            "date",
            F.year("date").alias("year"),
            F.quarter("date").alias("quarter"),
            F.month("date").alias("month"),
            F.dayofmonth("date").alias("day"),
            F.weekofyear("date").alias("week_of_year"),
            F.dayofweek("date").alias("day_of_week"),
            F.dayofweek("date").isin(1, 7).alias("is_weekend"),
        )
    )


def dim_exchange(stg: DataFrame) -> DataFrame:
    """Exchange dimension (``curated/dim_exchange.py:56-75``): distinct
    (country, upper(exchange)), crc32 SK over ``code:country``."""
    return (
        stg.select(
            F.upper(F.col("exchange")).alias("exchange_code"),
            F.col("country").alias("exchange_country"),
        )
        .where(F.col("exchange_code").isNotNull())
        .distinct()
        .withColumn(
            "exchange_sk",
            sk_crc32("exchange_code", "exchange_country", sep=":"),
        )
    )


def dim_currency(spark: SparkSession, stg: DataFrame) -> DataFrame:
    """Currency dimension (``curated/dim_currency.py:57-134``): distinct
    codes from stg, display name + FX rate attached via broadcast-joined
    seed lookups (the reference's deliberate UDF replacement, §2.9),
    crc32 SK."""
    names = spark.createDataFrame(CURRENCY_NAMES, ["currency_code", "currency_name"])
    rates = spark.createDataFrame(FX_RATES_VND, ["currency_code", "fx_rate_vnd"])
    base = (
        stg.select(F.col("currency").alias("currency_code"))
        .where(F.col("currency_code").isNotNull())
        .distinct()
    )
    return (
        base.join(F.broadcast(names), "currency_code", "left")
        .join(F.broadcast(rates), "currency_code", "left")
        .withColumn("currency_sk", sk_crc32("currency_code"))
    )


def dim_trading_status(stg: DataFrame) -> DataFrame:
    """Trading-status dimension (``curated/dim_trading_status.py:56-77``):
    VN-only rows (P7, ``:59``), disjunctive null guard (P6, ``:63``),
    crc32 SK over coalesced keys (``:65-67``)."""
    return (
        stg.where(F.col("country") == "VN")
        .select(
            F.col("trading_status_code").alias("status_code"),
            F.col("trading_status_group").alias("status_group"),
        )
        .where(F.col("status_code").isNotNull() | F.col("status_group").isNotNull())
        .distinct()
        .withColumn(
            "trading_status_sk",
            sk_crc32(
                F.coalesce(F.col("status_code"), F.lit("~")),
                F.coalesce(F.col("status_group"), F.lit("~")),
                sep=":",
            ),
        )
    )


COMPANY_ATTRS = ("company_name", "sector", "industry", "website", "employees")


def dim_company(stg: DataFrame, closed_boundaries: bool = True) -> DataFrame:
    """SCD2 company dimension (``curated/dim_company.py:57-110``):
    snapshots keyed (symbol, country), fingerprinted attributes,
    lag→cumsum→lead version assembly (W1-W3), crc32 SK over
    symbol||country||effective_from (``:98-99``).

    ``closed_boundaries=True`` replicates the reference's G3 boundary
    semantics (a fact dated on a version boundary matches 2 versions).
    """
    snaps = stg.where(
        F.col("symbol").isNotNull() & F.col("datadate").isNotNull()
    ).select("symbol", "country", "datadate", *COMPANY_ATTRS)
    scd2 = build_scd2(
        snaps,
        keys=("symbol", "country"),
        attrs=COMPANY_ATTRS,
        snapshot_col="datadate",
        closed_boundaries=closed_boundaries,
    )
    return scd2.withColumn(
        "company_sk",
        sk_crc32("symbol", "country", F.col("effective_from").cast("string")),
    )


def fact_stock_daily(
    stg: DataFrame,
    d_date: DataFrame,
    d_exchange: DataFrame,
    d_currency: DataFrame,
    d_status: DataFrame,
    d_company: DataFrame,
) -> DataFrame:
    """Fact assembly (``curated/fact_stock_daily.py:56-137``): measures
    with guarded pct_change + limit flags (``:78-82``), then J1-J5 —
    four broadcast left equi joins + the PIT range join J5
    (``:87-114``). Every dim is broadcast: the fact side never
    shuffles, so the plan is a single scan → project → 5 map-side
    joins, at any fact scale."""
    f = (
        stg.where(F.col("symbol").isNotNull() & F.col("datadate").isNotNull())
        .withColumn("date_sk", date_sk("datadate"))
        .withColumn(
            "pct_change",
            F.when(
                F.col("previous_close").isNull() | (F.col("previous_close") == 0),
                F.lit(None).cast("double"),
            ).otherwise(
                (F.col("current_price") - F.col("previous_close"))
                / F.col("previous_close")
            ),
        )
        .withColumn(
            "is_limit_up",
            (F.col("current_price").isNotNull() & F.col("ceiling").isNotNull())
            & (F.col("current_price") >= F.col("ceiling")),
        )
        .withColumn(
            "is_limit_down",
            (F.col("current_price").isNotNull() & F.col("floor").isNotNull())
            & (F.col("current_price") <= F.col("floor")),
        )
    )
    # J1 — dim_date on the smart key
    f = f.join(F.broadcast(d_date.select("date_sk")), "date_sk", "left")
    # J2 — dim_exchange on expressions upper(exchange)=code AND country
    f = f.join(
        F.broadcast(d_exchange),
        (F.upper(f["exchange"]) == d_exchange["exchange_code"])
        & (f["country"] == d_exchange["exchange_country"]),
        "left",
    ).drop("exchange_code", "exchange_country")
    # J3 — dim_currency on the code
    f = f.join(
        F.broadcast(d_currency.select("currency_code", "currency_sk")),
        f["currency"] == d_currency["currency_code"],
        "left",
    ).drop("currency_code")
    # J4 — dim_trading_status on 2 keys (SQL semantics: null never matches)
    f = f.join(
        F.broadcast(d_status),
        (f["trading_status_code"] == d_status["status_code"])
        & (f["trading_status_group"] == d_status["status_group"]),
        "left",
    ).drop("status_code", "status_group")
    # J5 — PIT range join to the SCD2 company dimension. No broadcast
    # hint: unlike the calendar/exchange/currency/status dims (bounded
    # domains), SCD2 company versions accumulate over the years — AQE
    # broadcasts at runtime only while the dim is actually small, and
    # falls back to a shuffle join on (symbol, country) once it isn't.
    # For a permanently shuffle-free plan, bucket both sides by symbol
    # (proven in tests/test_scale.py::test_pit_join_bucketed_no_shuffle).
    f = pit_join(
        f,
        d_company.select("symbol", "country", "effective_from", "effective_to", "company_sk"),
        keys=("symbol", "country"),
        time_col="datadate",
    ).drop("effective_from", "effective_to")
    return f.select(
        "date_sk",
        "symbol",
        "country",
        "company_sk",
        "exchange_sk",
        "currency_sk",
        "trading_status_sk",
        "current_price",
        "previous_close",
        "ceiling",
        "floor",
        "ref_price",
        "pct_change",
        "is_limit_up",
        "is_limit_down",
        "market_cap",
        "employees",
        "outstanding_share",
        "issue_share",
        "foreign_percent",
        "delta_in_week",
        "delta_in_month",
        "delta_in_year",
    )


STG_JOBS = {"VN": stg_vn, "US": stg_us, "JP": stg_jp}


def run_pipeline(
    spark: SparkSession,
    raw_batches: list[tuple[str, DataFrame, str]],
    out_dir: str,
) -> dict[str, DataFrame]:
    """Run the full DAG for a set of (country, raw_df, batch_date)
    batches, honoring the reference's fan-in: all stg jobs → 5 dims →
    fact (``lakehouse_dags.py:100-170``). Every write is a dynamic
    partition overwrite, so re-running any batch is idempotent.
    Returns the curated DataFrames (read back from the written store).
    """
    return run_pipeline_resilient(
        spark, raw_batches, out_dir, retries=0, resume=False
    )


def run_pipeline_resilient(
    spark: SparkSession,
    raw_batches: list[tuple[str, DataFrame, str]],
    out_dir: str,
    retries: int = 2,
    retry_delay_s: float = 0.0,
    resume: bool = True,
) -> dict[str, DataFrame]:
    """``run_pipeline`` with the reference's orchestration resilience
    semantics (SURVEY §2.10): per-task retry with a fixed delay
    (``lakehouse_dags.py:22-27`` — Airflow ``retries=2`` +
    ``retry_delay``) and marker-based resume so a re-run after a crash
    skips completed stages (``python_ingestion/vnstock.py:184-244``'s
    resumable-ingest pattern, applied to the curated DAG).

    Every stage write is idempotent (dynamic partition overwrite /
    static dim overwrite), so retry-after-partial-write is safe: the
    stage re-executes and overwrites its own output. Markers are
    committed only AFTER a stage's write returns, giving at-least-once
    execution with exactly-once effect. Marker state lives under
    ``{out_dir}/_pipeline_state`` — at cluster scale that directory sits
    in the same store as the data (the same pattern as Spark's own
    ``_SUCCESS`` files); here it is plain-file IO because ``out_dir``
    is a filesystem path.

    Marker semantics (what "completed" means per stage):
    - a stg stage's identity is ``(country, batch_date)`` — re-running
      a crashed multi-batch ingest skips the batches that landed;
    - dim/fact markers are keyed by a SIGNATURE of the full stg-marker
      set, so ingesting a NEW batch into an existing ``out_dir``
      invalidates (re-keys) every downstream marker and dims/fact are
      rebuilt over the grown staging table — stale markers can never
      mask new upstream data;
    - only markers that existed BEFORE this invocation cause skips: a
      stage name repeated within one call re-executes (last write wins,
      matching ``run_pipeline``'s overwrite semantics).
    """
    import hashlib
    import os
    import time

    state_dir = os.path.join(out_dir, "_pipeline_state")
    os.makedirs(state_dir, exist_ok=True)
    pre_existing = set(os.listdir(state_dir))
    ran_this_call: set[str] = set()

    def _run_stage(stage: str, fn) -> None:
        if resume and stage not in ran_this_call and f"{stage}.done" in pre_existing:
            return
        attempt = 0
        while True:
            try:
                fn()
                break
            except Exception:
                attempt += 1
                if attempt > retries:
                    raise
                if retry_delay_s:
                    time.sleep(retry_delay_s)
        ran_this_call.add(stage)
        with open(os.path.join(state_dir, f"{stage}.done"), "w") as f:
            f.write("done\n")

    for country, raw, batch_date in raw_batches:
        _run_stage(
            f"stg_{country}_{batch_date}",
            lambda country=country, raw=raw, batch_date=batch_date: (
                write_partitioned(
                    STG_JOBS[country](raw, batch_date),
                    f"{out_dir}/stg_stock",
                    partition_by=("country", "datadate"),
                )
            ),
        )
    # downstream marker key: every stg marker now in the store (prior
    # runs' plus this one's) — new upstream data means a new signature
    stg_sig = hashlib.md5(
        "|".join(
            sorted(m for m in os.listdir(state_dir) if m.startswith("stg_"))
        ).encode()
    ).hexdigest()[:12]

    # partitioned reads append partition cols last; restore the contract
    # order and exact types (partition inference can widen types)
    stg = align_to_contract(
        spark.read.parquet(f"{out_dir}/stg_stock"), STG_CONTRACT
    )

    dim_builders = {
        "dim_date": lambda: dim_date(stg),
        "dim_exchange": lambda: dim_exchange(stg),
        "dim_currency": lambda: dim_currency(spark, stg),
        "dim_trading_status": lambda: dim_trading_status(stg),
        "dim_company": lambda: dim_company(stg),
    }
    for name, build in dim_builders.items():
        _run_stage(
            f"{name}@{stg_sig}",
            lambda name=name, build=build: build()
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{name}"),
        )
    loaded = {n: spark.read.parquet(f"{out_dir}/{n}") for n in dim_builders}

    _run_stage(
        f"fact_stock_daily@{stg_sig}",
        lambda: write_partitioned(
            fact_stock_daily(
                stg,
                loaded["dim_date"],
                loaded["dim_exchange"],
                loaded["dim_currency"],
                loaded["dim_trading_status"],
                loaded["dim_company"],
            ),
            f"{out_dir}/fact_stock_daily",
            partition_by=("date_sk",),
        ),
    )
    loaded["stg_stock"] = stg
    loaded["fact_stock_daily"] = spark.read.parquet(f"{out_dir}/fact_stock_daily")
    return loaded
