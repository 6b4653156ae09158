"""Column-expression library: JVM-side (whole-stage-codegen'd)
building blocks shared by the operator modules. No UDFs here — every
function returns a Catalyst expression tree.
"""
