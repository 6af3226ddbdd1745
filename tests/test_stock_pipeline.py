"""Pipeline-level golden test (SURVEY §5 item 2): raw stock CSVs →
stg contract → 5 dims → fact, asserting row counts, surrogate-key
determinism, SCD2 interval invariants, G3 boundary fan-out, and
idempotent re-runs. Raw fixtures exercise the reference's CSV edge
cases (G8): UTF-8 BOM, multiline quoted summaries, dirty numerics,
"Not found" placeholders, null/empty symbols."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from lambda_lakehouse_spark.plans.stock_pipeline import (
    STG_CONTRACT,
    run_pipeline,
)
from lambda_lakehouse_spark.sources.readers import read_csv_raw

VN_HEADER = (
    "symbol,datadate,company_name,industry,website,no_employees,ref_price,"
    "prior_close_price,ceiling,floor,foreign_percent,delta_in_week,"
    "delta_in_month,delta_in_year,average_match_volume2_week,"
    "outstanding_share,issue_share,exchange_overview,exchange_price,"
    "trading_status,trading_status_code,trading_status_group"
)

# day-keyed VN rows: AAA changes industry on D2; BBB employees go
# NULL→640 on D2 (both SCD2 version breaks); one dirty-numeric row, one null symbol row (filtered),
# one prev_close=0 row (pct_change NULL guard), AAA hits its ceiling
# on D1 (is_limit_up).
VN_DAYS = {
    "2025-10-22": [
        'aaa ,2025-10-22,Alpha Corp,Banking,https://a.vn,"1,200",12.5,12.0,'
        "12.5,11.0,0.12,0.5,1.0,2.0,34000,100.5,99,HOSE,,Active,ACT,NORMAL",
        'BBB,2025-10-22,"Beta, Inc",Retail,https://b.vn,Not found,8.0,0,8.8,'
        "7.2,0.05,0.1,0.2,0.3,12000,50.25,50,,HNX,Active,ACT,NORMAL",
        ",2025-10-22,NoSymbol Co,X,,10,1,1,1,1,0,0,0,0,1,1,1,HOSE,,A,A,A",
    ],
    "2025-10-23": [
        "AAA,2025-10-23,Alpha Corp,Insurance,https://a.vn,1200,13.0,12.5,"
        "13.75,11.25,0.12,0.5,1.0,2.0,34000,100.5,99,HOSE,,Active,ACT,NORMAL",
        'BBB,2025-10-23,"Beta, Inc",Retail,https://b.vn,640 people,8.2,8.0,'
        "8.8,7.2,0.05,0.1,0.2,0.3,12000,50.25,50,,HNX,Active,ACT,NORMAL",
    ],
    "2025-10-24": [
        "AAA,2025-10-24,Alpha Corp,Insurance,https://a.vn,1200,13.1,13.0,"
        "14.3,11.7,0.12,0.5,1.0,2.0,34000,100.5,99,HOSE,,Active,ACT,NORMAL",
        'BBB,2025-10-24,"Beta, Inc",Retail,https://b.vn,640,8.4,8.2,8.8,'
        "7.2,0.05,0.1,0.2,0.3,12000,50.25,50,,HNX,Halted,HLT,SUSPENDED",
    ],
}

US_HEADER = (
    "symbol,company_name,sector,industry,website,business_summary,"
    "full_time_employees,market_cap,country,city,phone,previous_close,"
    "current_price,currency,datadate"
)
US_ROWS = [
    'MSGR,Messenger Co,Tech,Software,https://m.us,"Makes software.\n'
    'Multiline summary, with a comma.","12,345","1,000,000",United States,'
    "NYC,555,100.0,101.5,USD,2025-10-24",
    "ACME,Acme Corp,Industrial,Widgets,https://a.us,Plain summary,Not found,"
    "500000,United States,LA,555,20.0,19.5,USD,2025-10-24",
]

JP_HEADER = (
    "ticker,company_name,company_name_jp,sector,industry,website,"
    "business_summary,employees,market_cap,exchange,method,previous_close,"
    "current_price,currency,datadate"
)
JP_ROWS = [
    "9996,Nippon Co,ニッポン,Auto,Cars,https://n.jp,Summary JP,4400,"
    "90000,TSE,scrape,1500.0,1512.0,JPY,2025-10-24",
]


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    raw_dir = tmp_path_factory.mktemp("raw")
    batches = []
    for day, rows in VN_DAYS.items():
        p = raw_dir / f"vn_{day}.csv"
        # utf-8-sig BOM, as the reference's ingest writes (vnstock.py:49)
        p.write_text("\n".join([VN_HEADER, *rows]), encoding="utf-8-sig")
        batches.append(("VN", read_csv_raw(spark, str(p)), day))
    us = raw_dir / "us.csv"
    us.write_text("\n".join([US_HEADER, *US_ROWS]), encoding="utf-8-sig")
    batches.append(("US", read_csv_raw(spark, str(us)), "2025-10-24"))
    jp = raw_dir / "jp.csv"
    jp.write_text("\n".join([JP_HEADER, *JP_ROWS]), encoding="utf-8")
    batches.append(("JP", read_csv_raw(spark, str(jp)), "2025-10-24"))

    out = str(tmp_path_factory.mktemp("curated"))
    return run_pipeline(spark, batches, out), out, batches


def test_stg_contract_shape(spark, pipeline_out):
    tables, _, _ = pipeline_out
    stg = tables["stg_stock"]
    assert [f.name for f in stg.schema.fields] == [c for c, _ in STG_CONTRACT]
    # null-symbol row filtered; VN 2+2+2, US 2, JP 1
    assert stg.count() == 9
    # dirty numerics cleaned: "1,200" → 1200; "Not found" → NULL;
    # "640 people" → 640
    aaa = stg.where((F.col("symbol") == "AAA") & (F.col("datadate") == "2025-10-22"))
    row = aaa.collect()[0]
    assert row.employees == 1200
    assert row.outstanding_share == 100_500_000  # millions scaled, long
    bbb_d1 = stg.where(
        (F.col("symbol") == "BBB") & (F.col("datadate") == "2025-10-22")
    ).collect()[0]
    assert bbb_d1.employees is None  # "Not found"
    assert bbb_d1.company_name == "Beta, Inc"  # quoted comma survives
    # symbol normalized from ' aaa '
    assert stg.where(F.col("symbol") == "AAA").count() == 3
    # US multiline summary row parsed as ONE record with employees cleaned
    msgr = stg.where(F.col("symbol") == "MSGR").collect()[0]
    assert msgr.employees == 12345 and msgr.market_cap == 1_000_000.0
    # JP symbol from ticker, currency stamped
    jp = stg.where(F.col("country") == "JP").collect()[0]
    assert jp.symbol == "9996" and jp.currency == "JPY"


def test_dims_golden(spark, pipeline_out):
    tables, _, _ = pipeline_out
    dd = tables["dim_date"]
    assert dd.count() == 3
    d = {r.date.isoformat(): r for r in dd.collect()}
    assert d["2025-10-24"].date_sk == 20251024
    assert d["2025-10-24"].is_weekend is False  # a Friday

    dex = tables["dim_exchange"]
    codes = {(r.exchange_code, r.exchange_country) for r in dex.collect()}
    assert codes == {("HOSE", "VN"), ("HNX", "VN"), ("TSE", "JP")}
    # crc32 SK determinism against zlib
    for r in dex.collect():
        expect = zlib.crc32(f"{r.exchange_code}:{r.exchange_country}".encode())
        assert r.exchange_sk == expect

    dcur = tables["dim_currency"]
    cur = {r.currency_code: r for r in dcur.collect()}
    assert set(cur) == {"VND", "USD", "JPY"}
    assert cur["USD"].fx_rate_vnd == 25000.0
    assert cur["VND"].currency_name == "Vietnamese Dong"

    dst = tables["dim_trading_status"]
    st = {(r.status_code, r.status_group) for r in dst.collect()}
    assert st == {("ACT", "NORMAL"), ("HLT", "SUSPENDED")}


def test_dim_company_scd2_invariants(spark, pipeline_out):
    tables, _, _ = pipeline_out
    dc = tables["dim_company"]
    # AAA changed industry on D2 → 2 versions; BBB's employees went
    # "Not found"(NULL) → 640 on D2 → also 2 versions
    assert dc.where(F.col("symbol") == "AAA").count() == 2
    assert dc.where(F.col("symbol") == "BBB").count() == 2
    # exactly one open current version per key
    cur = dc.where(F.col("is_current"))
    assert cur.count() == dc.select("symbol", "country").distinct().count()
    assert all(r.effective_to.isoformat() == "9999-12-31" for r in cur.collect())
    # reference G3 parity: v1.effective_to == v2.effective_from
    aaa = sorted(
        dc.where(F.col("symbol") == "AAA").collect(), key=lambda r: r.version
    )
    assert aaa[0].effective_to == aaa[1].effective_from
    # crc32 SK over symbol||country||effective_from
    for r in aaa:
        expect = zlib.crc32(
            f"AAA||VN||{r.effective_from.isoformat()}".encode()
        )
        assert r.company_sk == expect


def test_fact_assembly_and_g3_fanout(spark, pipeline_out):
    tables, _, _ = pipeline_out
    fact = tables["fact_stock_daily"]
    # grain: one row per stg row EXCEPT the G3 boundary fan-out — AAA
    # and BBB both version-break on D2, so each D2 fact row matches two
    # versions (the documented reference behavior, SURVEY G3)
    assert fact.count() == 9 + 2
    boundary = fact.where(
        (F.col("symbol") == "AAA") & (F.col("date_sk") == 20251023)
    )
    assert boundary.count() == 2
    assert boundary.select("company_sk").distinct().count() == 2

    # pct_change NULL guard: BBB D1 has previous_close = 0
    bbb_d1 = fact.where(
        (F.col("symbol") == "BBB") & (F.col("date_sk") == 20251022)
    ).collect()[0]
    assert bbb_d1.pct_change is None
    # limit-up flag: AAA D1 current == ceiling
    aaa_d1 = fact.where(
        (F.col("symbol") == "AAA") & (F.col("date_sk") == 20251022)
    ).collect()[0]
    assert aaa_d1.is_limit_up is True and aaa_d1.is_limit_down is False
    # FK coverage: VN rows all resolve exchange + currency + status SKs
    vn = fact.where(F.col("country") == "VN")
    assert vn.where(F.col("currency_sk").isNull()).count() == 0
    assert vn.where(F.col("trading_status_sk").isNull()).count() == 0
    # US rows: exchange is NULL by design → no exchange SK (left join)
    us = fact.where(F.col("country") == "US")
    assert us.where(F.col("exchange_sk").isNull()).count() == us.count()


def test_rerun_idempotent(spark, pipeline_out):
    tables, out, batches = pipeline_out
    before = tables["fact_stock_daily"].count()
    # re-run only the last VN day + JP batch: dynamic overwrite must
    # replace, not duplicate
    rerun = [b for b in batches if b[2] == "2025-10-24" and b[0] in ("VN", "JP")]
    tables2 = run_pipeline(spark, rerun, out)
    assert tables2["stg_stock"].count() == 9
    assert tables2["fact_stock_daily"].count() == before


def test_pipeline_retry_recovers_transient_failure(
    spark, pipeline_out, tmp_path, monkeypatch
):
    """§2.10 retry semantics (Airflow retries=2 in the reference): a
    stage that fails transiently is re-executed and the DAG completes;
    with retries exhausted the failure propagates."""
    from lambda_lakehouse_spark.plans import stock_pipeline as sp

    _, _, batches = pipeline_out
    out = str(tmp_path / "retry_out")

    real_stg_us = sp.STG_JOBS["US"]
    calls = {"n": 0}

    def flaky_us(raw, batch_date):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient: simulated executor loss")
        return real_stg_us(raw, batch_date)

    monkeypatch.setitem(sp.STG_JOBS, "US", flaky_us)
    tables = sp.run_pipeline_resilient(spark, batches, out, retries=2)
    assert calls["n"] == 2  # failed once, retried once, succeeded
    assert tables["stg_stock"].count() == 9

    # retries=0 propagates the first failure
    calls["n"] = 0
    with pytest.raises(RuntimeError, match="transient"):
        sp.run_pipeline_resilient(
            spark, batches, str(tmp_path / "retry_out2"), retries=0, resume=False
        )


def test_pipeline_resume_skips_completed_stages(spark, pipeline_out, tmp_path, monkeypatch):
    """§2.10 resume semantics (vnstock.py's resumable ingest): after a
    mid-DAG crash, the re-run skips stages whose completion marker
    exists and executes only the remainder."""
    from lambda_lakehouse_spark.plans import stock_pipeline as sp

    _, _, batches = pipeline_out
    out = str(tmp_path / "resume_out")

    real_dim_company = sp.dim_company
    fail = {"on": True}

    def crashing_dim_company(stg, closed_boundaries=True):
        if fail["on"]:
            raise RuntimeError("crash: simulated OOM in dim_company")
        return real_dim_company(stg, closed_boundaries)

    monkeypatch.setattr(sp, "dim_company", crashing_dim_company)
    with pytest.raises(RuntimeError, match="crash"):
        sp.run_pipeline_resilient(spark, batches, out, retries=0)

    # stg + the dims built before the crash are marked done (dim/fact
    # markers carry the stg-set signature after the @)
    import os

    state = os.path.join(out, "_pipeline_state")
    done_before = set(os.listdir(state))
    assert any(m.startswith("stg_") for m in done_before)
    assert not any(m.startswith("dim_company@") for m in done_before)

    # the resumed run must NOT re-execute completed stg stages
    stg_calls = {"n": 0}
    real_vn = sp.STG_JOBS["VN"]

    def counting_vn(raw, batch_date):
        stg_calls["n"] += 1
        return real_vn(raw, batch_date)

    monkeypatch.setitem(sp.STG_JOBS, "VN", counting_vn)
    fail["on"] = False
    tables = sp.run_pipeline_resilient(spark, batches, out, retries=0, resume=True)
    assert stg_calls["n"] == 0  # completed stages skipped
    assert any(m.startswith("dim_company@") for m in os.listdir(state))
    # resumed DAG converges to exactly the clean run's output (fresh
    # read: earlier idempotency tests rewrote the clean store's files,
    # so the fixture's cached DataFrame holds a stale file listing)
    _, clean_out, _ = pipeline_out
    clean_count = spark.read.parquet(f"{clean_out}/fact_stock_daily").count()
    assert tables["fact_stock_daily"].count() == clean_count


def test_pipeline_resume_rebuilds_dims_for_new_batches(spark, pipeline_out, tmp_path):
    """Regression for the stale-marker hazard: dim/fact markers are
    keyed by the stg-marker-set signature, so ingesting a NEW batch
    into an existing out_dir must rebuild dims and fact over the grown
    staging table — not skip them because yesterday's markers exist."""
    from lambda_lakehouse_spark.plans import stock_pipeline as sp

    _, clean_out, batches = pipeline_out
    out = str(tmp_path / "incr_out")

    # day 1: everything except the JP batch
    day1 = [b for b in batches if b[0] != "JP"]
    t1 = sp.run_pipeline_resilient(spark, day1, out, retries=0, resume=True)
    assert t1["stg_stock"].count() == 8  # JP row missing
    assert t1["dim_exchange"].where(
        F.col("exchange_code") == "TSE"
    ).count() == 0

    # day 2 into the SAME out_dir: only the JP batch is new
    day2 = [b for b in batches if b[0] == "JP"]
    t2 = sp.run_pipeline_resilient(spark, day2, out, retries=0, resume=True)
    assert t2["stg_stock"].count() == 9
    # dims were re-keyed and rebuilt: the JP exchange now exists
    assert t2["dim_exchange"].where(
        F.col("exchange_code") == "TSE"
    ).count() == 1
    # fact converges to the clean full-run output
    clean_count = spark.read.parquet(f"{clean_out}/fact_stock_daily").count()
    assert t2["fact_stock_daily"].count() == clean_count
