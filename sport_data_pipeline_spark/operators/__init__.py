"""Library-level operators composing public DataFrame APIs.

No custom Catalyst rules are required for the reference's surface
(SURVEY.md §4): everything here is declarative composition, so predicate
pushdown, AQE, and whole-stage codegen apply unchanged.
"""
