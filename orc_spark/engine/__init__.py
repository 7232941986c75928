"""Spark control plane: stats sampling, codec selection, salted
repartitioning, mapInArrow encode/decode stages, lineage + resume,
metrics reports. See SURVEY.md §2.2 for the operator inventory."""
