# Developer entry points.

.PHONY: test native bench dryrun clean

test:
	python -m pytest tests/ -x -q

native:
	$(MAKE) -C native

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	rm -rf results/ .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
