"""Constraint-gadget twins of every primitive (the reference's
`constraints.rs` files; SURVEY.md §2)."""
