from .mc import MC, MCParameters, MCAnalysis
