# Native IO library (csrc/nrcio.cpp) -> libnrcio.so, loaded via ctypes
# (neuralradiancecaching_tpu/io/native.py). `make` then `make test`.

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -fPIC -std=c++17 -Wall

LIB := neuralradiancecaching_tpu/io/libnrcio.so

all: $(LIB)

$(LIB): csrc/nrcio.cpp
	$(CXX) $(CXXFLAGS) -shared -o $@ $<

test: $(LIB)
	python -m pytest tests/ -x -q

clean:
	rm -f $(LIB)

.PHONY: all test clean
