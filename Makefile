# biocurator_mapper_spark build/test/bench entry points

PY ?= python

.PHONY: test bench scaling package check-oracles plans

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

scaling:
	$(PY) tools/scaling_bench.py --levels 2,8 --replicas 150

check-oracles:
	$(PY) tools/check_oracles.py /root/testdata/sf0.01

plans:
	$(PY) tools/plan_audit.py > PLANS.md

# zip the package for spark-submit --py-files on a real cluster:
#   spark-submit --py-files dist/bcms.zip your_job.py
package:
	mkdir -p dist
	rm -f dist/bcms.zip
	zip -qr dist/bcms.zip biocurator_mapper_spark -x '*__pycache__*'
