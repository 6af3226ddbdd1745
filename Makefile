SF ?= /root/testdata/sf0.001

.PHONY: test test-sf01 verify bench audit

test:
	python -m pytest tests/ -q

test-sf01:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/ -q

verify:
	python tools/drive_driver.py

bench:
	python bench.py

audit:
	python tools/plan_audit.py
