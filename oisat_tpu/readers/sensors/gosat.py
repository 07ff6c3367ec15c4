"""GOSAT product readers (full implementation in the sensor milestone)."""


def gosat_reader(*args, **kwargs):
    raise NotImplementedError("GOSAT reader lands with the sensor milestone")
