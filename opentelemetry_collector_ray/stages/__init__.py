"""Pipeline stages (the processor/connector analog layer, SURVEY.md §2.2-2.7).

Every stage is either a pure function over a pyarrow.Table (stateless
task) or a callable class (actor pool; state built once in __init__) —
the two shapes ``Dataset.map_batches`` accepts.
"""
