"""map_batches-level transforms: stateless batch fns + stateful actor classes.

Convention: every stage consumes/produces ``pyarrow.Table`` batches
(``batch_format="pyarrow"`` — zero-copy from the object store); pixel work
happens on numpy views decoded per batch, never stored in the table.
"""
