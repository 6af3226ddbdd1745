SF ?= /root/testdata/sf0.001

.PHONY: test verify bench audit scan-audit oracle-bench-scale rank-sweep

test:
	SPARK_GRAFT_TEST_SF_DIR=$(SF) python -m pytest tests/ -q

verify:
	python tools/drive_driver.py

bench:
	python bench.py

audit:
	python tools/plan_audit.py

# Oracle gate at BENCH scale (sf0.1) — the sweep that caught DuckDB's
# HUGEINT->DOUBLE rounding drift; slower (~45 min), run before a round
# closes or after touching any floor-scaled oracle arithmetic.
oracle-bench-scale:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 python -m pytest tests/test_oracle_queries.py -q

# Executed-plan scan-amplification sweep (tools/scan_audit.py): counts
# PHYSICAL scans per table per query; catches lineage re-execution that
# the compile-time guardrails cannot see (exchange reuse silently fails
# under nondeterministic exprs like collect_set).
scan-audit:
	python tools/scan_audit.py

# Full-registry wall-clock ranking at sf0.1 (tools/rank_sweep.py):
# finds the hidden hotspots the bench headline set cannot (round 9:
# dedup_lsh_eval 455 s, dedup_simhash_hamming_pairs 138 s, both
# driver-green). Ranking only — disposition via bench.py --single.
rank-sweep:
	python tools/rank_sweep.py
