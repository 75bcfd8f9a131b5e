from .library import ENCODING_TYPES, build_circuit
