# Test loops. The default `make test` is the fast iteration loop (slow-marked
# e2e/oracle/mesh/full-scale tests excluded via pytest addopts); `make
# test-all` runs the complete suite, sharded across SHARDS processes
# (round-robin by file — the suite is dominated by a few long files, so
# file-level sharding balances well).

SHARDS ?= 4
PYTEST ?= python -m pytest

.PHONY: test test-all test-shard

test:
	$(PYTEST) tests/ -q

test-all:
	@set -e; \
	files=$$(ls tests/test_*.py); \
	pids=""; rc=0; \
	for i in $$(seq 0 $$(( $(SHARDS) - 1 ))); do \
	  shard=$$(echo "$$files" | awk "NR % $(SHARDS) == $$i" | tr '\n' ' '); \
	  if [ -n "$$shard" ]; then \
	    $(PYTEST) -q -m 'slow or not slow' -p no:cacheprovider $$shard & \
	    pids="$$pids $$!"; \
	  fi; \
	done; \
	for p in $$pids; do wait $$p || rc=1; done; \
	exit $$rc
