SF ?= /root/testdata/sf0.001

.PHONY: test verify bench audit

test:
	SPARK_GRAFT_TEST_SF_DIR=$(SF) python -m pytest tests/ -q

verify:
	python tools/drive_driver.py

bench:
	python bench.py

audit:
	python tools/plan_audit.py
