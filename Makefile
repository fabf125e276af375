.PHONY: test bench smoke native dryrun clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

smoke:
	python tools/tpu_smoke.py

native:
	$(MAKE) -C native

dryrun:
	python __graft_entry__.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
