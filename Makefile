# careless-tpu developer targets.

.PHONY: check test native bench artifacts clean

# Full gate: native lib + artifact generation + the whole pytest suite.
# The stats tests regenerate their own artifacts via a fixture, so a broken
# artifact pipeline fails the suite instead of silently skipping.
check: native test

native:
	$(MAKE) -C cpp

test:
	python -m pytest tests/ -q

bench:
	python bench.py --quick

clean:
	$(MAKE) -C cpp clean
