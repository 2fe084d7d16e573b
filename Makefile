.PHONY: test ci native bench perf refparity-full clean

test:
	python -m pytest tests/ -x -q

# One command reproducing the round's green evidence: fast test tier +
# single-chip entry lowering + 8-virtual-device sharded dryrun, results
# written to CI_LAST.json (add BENCH=1 for the real TPU bench).
ci:
	python tools/ci.py $(if $(BENCH),--bench,)

# Regenerate the 247MB full-scale refparity victim deterministically
# (~40min CPU torch), verify its sha256 against the pinned manifest,
# then run the [full]-marked parity tests that skip without it.
refparity-full:
	python tools/make_refparity_fixture.py --full --steps 600
	python tools/verify_fixture.py tests/fixtures/refparity_full
	python -m pytest tests/test_refparity.py -q -k full

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
