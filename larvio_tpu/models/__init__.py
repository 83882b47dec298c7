"""Estimator and front-end models (ref: src/larvio.cpp, src/image_processor.cpp)."""
