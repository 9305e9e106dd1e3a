"""Device-side compute ops: particle pushes, field interpolation,
current deposition, and the Maxwell solver."""
