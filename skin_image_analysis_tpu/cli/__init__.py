"""The framework's command-line surface (console entry points).

Same positional grammar as the reference's ``python src/tone_bias_*.py``
invocations (SURVEY.md L0-L8 CLIs) plus optional ``--flag`` extras; see
MIGRATION.md for the full mapping. The repo-root ``cli/`` directory holds
launcher shims for checkout use.
"""
