from . import checkpoint, engine, evaluate, metrics, training
