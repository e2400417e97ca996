# One-command CI gate: syntax, tests, wheel, import smoke (scripts/check.sh).
.PHONY: check test wheel
check:
	bash scripts/check.sh
test:
	python -m pytest tests/ -q
wheel:
	python -m build --wheel --no-isolation -o dist
