"""Interchange export: hand-rolled ONNX (no `onnx` package needed), plus the
StableHLO / TF SavedModel / reverse-`.pt` paths in cli/export.py."""
