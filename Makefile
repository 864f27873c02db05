.PHONY: dist test check bench clean

dist:
	mkdir -p dist
	rm -f dist/engine.zip
	cd . && zip -qr dist/engine.zip scalemine_spark -x '*__pycache__*'
	@echo "dist/engine.zip ready: spark-submit --py-files dist/engine.zip cli_main.py <job> ..."

test:
	python -m pytest tests/ -x -q

check:
	python tools/check_oracles.py

bench:
	python bench.py

clean:
	rm -rf dist .cache .pytest_cache $$(find . -name __pycache__)
