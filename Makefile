# haslr_tpu build/test entry points (the reference's Makefile role:
# build native components + wire up the tool suite)

PY ?= python

.PHONY: all native test bench clean

all: native

# build the native C++ I/O library (also built lazily on first import)
native:
	$(PY) -c "from haslr_tpu import native; assert native.get_lib() is not None, 'native build failed'; print('libhaslr.so ready')"

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

clean:
	rm -f haslr_tpu/native/libhaslr.so
	find . -name __pycache__ -type d -exec rm -rf {} +
