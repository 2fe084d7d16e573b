.PHONY: test native bench perf clean

test:
	python -m pytest tests/ -x -q

native:
	$(MAKE) -C native

bench:
	python bench.py

perf:
	python tools/perf_breakdown.py 8
	python tools/detector_throughput.py 16

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
