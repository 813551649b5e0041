"""Pure column-expression helpers (JVM-side, whole-stage-codegen-able)."""
