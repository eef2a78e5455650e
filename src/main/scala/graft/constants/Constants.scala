package graft.constants

/** Domain constant tables from the reference's CONSTANTS.py, re-expressed
  * as Scala data. These are the "what" (public bio-identifier formats and
  * biolink category sets), used as literal dimension tables /
  * `typedLit` sets so Catalyst constant-folds them.
  */
object Constants {

  val DbPrefix = "DRUGBANK:"

  /** 24 biolink categories gating mechanistic NER matches
    * (CONSTANTS.py:2-12).
    */
  val MechanisticCategories: Set[String] = Set(
    "biolink:BiologicalProcess", "biolink:BiologicalProcessOrActivity",
    "biolink:Cell", "biolink:CellularComponent", "biolink:Drug",
    "biolink:Disease", "biolink:DiseaseOrPhenotypicFeature",
    "biolink:Gene", "biolink:GeneProduct", "biolink:GeneFamily",
    "biolink:GeneGroupingMixin", "biolink:GeneOrGeneProduct",
    "biolink:MolecularActivity", "biolink:NoncodingRNAProduct",
    "biolink:PathologicalProcess", "biolink:PhenotypicFeature",
    "biolink:Pathway", "biolink:Protein",
    "biolink:ProteinDomain", "biolink:ProteinFamily",
    "biolink:PhysiologicalProcess", "biolink:RNAProduct",
    "biolink:SmallMolecule", "biolink:Transcript")

  /** 3 categories gating indication NER matches (perform_NER.py:121-123). */
  val IndicationCategories: Set[String] = Set(
    "biolink:Disease", "biolink:DiseaseOrPhenotypicFeature",
    "biolink:PhenotypicFeature")

  /** Text fields concatenated for mechanistic NER (CONSTANTS.py:14-15). */
  val MostlyTextFields: Seq[String] = Seq(
    "description", "indication", "pharmacodynamics", "mechanism_of_action",
    "metabolism", "protein_binding")

  /** Structured fields mined for names/ids in stage 2 (CONSTANTS.py:21). */
  val IdentifierFields: Seq[String] = Seq(
    "pathways", "reactions", "targets", "enzymes", "carriers", "transporters")

  /** R1 detector dimension: external DB name → (curie prefix, id regex)
    * (CONSTANTS.py:28-62). A database with an empty prefix still counts as
    * a detector but produces the bare `:`-prefixed candidate, exactly as
    * `'' + ':' + input` does in the reference. Patterns are unanchored —
    * the reference uses findall, i.e. "pattern occurs somewhere" — and the
    * candidate is the prefix + the ENTIRE input, not the matched substring
    * (look_for_identifiers.py:30-31).
    */
  val IdDetectors: Seq[(String, String, String)] = Seq(
    ("DrugBank",         "DRUGBANK",          """DB\d+"""),
    ("CAS",              "CAS",               """\d{2,7}-\d{2}-\d"""),
    ("KEGG Compound",    "KEGG.COMPOUND",     """C\d{5}"""),
    ("KEGG Drug",        "KEGG.DRUG",         """D\d{5}"""),
    ("PubChem Compound", "PUBCHEM.COMPOUND",  """\d{4,9}"""),
    ("PubChem Substance", "PUBCHEM.SUBSTANCE", """\d{4,9}"""),
    ("ChEBI",            "CHEBI",             """\d+"""),
    ("PharmGKB",         "PHARMGKB",          """PA\d+"""),
    ("HET",              "",                  """\w{3}"""),
    ("UniProt",          "UNIPROTKB",         """[OPQ][0-9][A-Z0-9]{3}[0-9]"""),
    ("GenBank",          "GENBANK",           """\w{2}\d{6}"""),
    ("DPD",              "",                  """\d+"""),
    ("NDC",              "NDC",               """\d{4}-\d{4}-\d{2}"""),
    ("SMPDB",            "SMPDB",             """SMP\d+"""),
    ("PR",               "PR",                """P:\d+"""))

  /** R2 fan-out universe: every curie prefix in the synonymizer
    * (CONSTANTS.py:69-87).
    */
  val AllPrefixes: Seq[String] = Seq(
    "AEO", "ARO", "ATC", "AraPort", "BAO", "BFO", "BSPO", "BTO", "CARO",
    "CAS", "CEPH", "CGNC", "CHEBI", "CHEMBL.COMPOUND", "CHEMBL.MECHANISM",
    "CHEMBL.TARGET", "CHMO", "CL", "CLO", "CP", "CVDO", "DDANAT", "DGIdb",
    "DOID", "DRUGBANK", "DisGeNET", "DrugCentral", "EC", "ECO", "ECOCORE",
    "ECTO", "EDAM", "EFO", "EHDAA2", "EMAPA", "ENSEMBL", "ENVO", "EO",
    "EPO", "ERO", "EnsemblGenomes", "ExO", "FAO", "FB", "FBbt", "FBdv",
    "FBgn", "FIX", "FLU", "FMA", "FOODON", "GAZ", "GENEPIO", "GENO", "GEO",
    "GO", "GOREL", "GTOPDB", "HANCESTRO", "HCPCS", "HGNC", "HMDB", "HP",
    "IAO", "ICD10", "ICD10PCS", "ICD9", "ICO", "IDO", "INCHIKEY",
    "JensenLab", "KEGG.COMPOUND", "KEGG.DISEASE", "KEGG.DRUG",
    "KEGG.ENZYME", "KEGG.GLYCAN", "KEGG.REACTION", "KEGG", "KEGG_source",
    "MA", "MAXO", "MEDDRA", "MESH", "MF", "MFOMD", "MGI", "MI", "MMO",
    "MOD", "MONDO", "MP", "MPATH", "NBO", "NCBIGene", "NCBITaxon", "NCIT",
    "NCRO", "NDDF", "OAE", "OBA", "OBAN", "OBI", "OBO", "OGG", "OGMS",
    "OIO", "OMIABIS", "OMIM.PS", "OMIM", "OMIT", "OMP", "OMRSE", "OPL",
    "ORPHANET", "PATO", "PCO", "PDQ", "PECO", "PO", "PR", "PSY",
    "PUBCHEM.COMPOUND", "PW", "PathWhiz.Bound", "PathWhiz.Compound",
    "PathWhiz.ElementCollection", "PathWhiz.NucleicAcid",
    "PathWhiz.ProteinComplex", "PathWhiz.Reaction", "PathWhiz", "PomBase",
    "REACT", "REPODB", "RGD", "RHEA", "RO", "RTX", "RXNORM", "SEMMEDDB",
    "SGD", "SIO", "SMPDB", "SNOMED", "SNOMEDCT", "SO", "STATO", "STY",
    "SYMP", "TCDB", "TO", "TRANS", "TypOn", "UBERON", "UBERON_CORE",
    "UBPROP", "UMLS", "UNICHEM_source", "UNII", "UO", "UPHENO",
    "UniProtKB", "VCARD", "VT", "WBbt", "WBls", "WormBase", "XCO", "ZEA",
    "ZFA", "ZFIN", "biolink", "biolink_download_source", "dbpedia", "dc",
    "dct", "dictyBase", "dictybase.gene", "doap", "ecogene", "foaf",
    "identifiers_org_registry", "linkml", "medgen", "miRBase", "owl",
    "rdf", "rdfs", "skos", "ttd.target", "umls_source", "wb")
}
