"""TEMPO product readers (full implementation in the sensor milestone)."""


def tempo_reader(*args, **kwargs):
    raise NotImplementedError("TEMPO reader lands with the sensor milestone")
