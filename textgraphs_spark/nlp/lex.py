"""Closed-class lexicons and gazetteers for the deterministic tagger.

These are fixed, versioned vocabularies: changing them changes extraction
output, so treat any edit as a breaking change to the extraction contract
(the per-url byte-identity invariant).
"""

from __future__ import annotations

DET = {"a", "an", "the", "this", "that", "these", "those", "each", "every", "some", "any", "no"}

AUX = {
    "is", "are", "was", "were", "am", "be", "been", "being",
    "has", "have", "had", "having",
    "do", "does", "did",
    "will", "would", "can", "could", "shall", "should", "may", "might", "must",
}

ADP = {
    "of", "in", "on", "at", "from", "with", "by", "for", "to", "into", "onto",
    "over", "under", "between", "through", "during", "about", "against",
    "among", "within", "without", "across", "behind", "beyond", "near",
    "after", "before", "above", "below", "off", "out", "up", "down", "as",
}

PRON = {
    "i", "you", "he", "she", "it", "we", "they", "me", "him", "her", "us",
    "them", "his", "its", "their", "our", "your", "my", "mine", "yours",
    "hers", "ours", "theirs", "who", "whom", "which", "what", "себя",
    "himself", "herself", "itself", "themselves", "myself", "yourself",
}

CCONJ = {"and", "or", "but", "nor", "yet"}

SCONJ = {"if", "because", "while", "although", "though", "since", "unless", "whereas", "whether"}

ADV = {
    "not", "very", "too", "also", "just", "only", "even", "still", "already",
    "often", "never", "always", "sometimes", "here", "there", "now", "then",
    "again", "soon", "originally", "remarkably", "however", "perhaps", "quite",
    "rather", "really", "almost", "together",
}

# common verbs (base forms); inflected forms resolve via suffix rules
VERB = {
    "run", "make", "take", "see", "go", "come", "say", "get", "know", "think",
    "want", "give", "use", "find", "tell", "work", "call", "try", "need",
    "feel", "become", "leave", "put", "mean", "keep", "let", "begin", "seem",
    "help", "talk", "turn", "start", "show", "hear", "play", "move", "like",
    "live", "believe", "bring", "happen", "write", "provide", "sit", "stand",
    "lose", "pay", "meet", "include", "continue", "set", "learn", "change",
    "lead", "understand", "watch", "follow", "stop", "create", "speak",
    "read", "allow", "add", "spend", "grow", "open", "walk", "win", "offer",
    "remember", "love", "consider", "appear", "buy", "wait", "serve", "die",
    "send", "expect", "build", "stay", "fall", "cut", "reach", "kill",
    "remain", "direct", "act", "born", "film", "found", "star", "produce",
    "praise", "honor", "travel", "visit", "shoot", "present", "arrive",
}

# common adjectives that suffix rules would miss or mis-tag
ADJ = {
    "remarkable", "good", "bad", "new", "old", "great", "big", "small",
    "large", "long", "short", "high", "low", "young", "early", "late",
    "important", "public", "able", "own", "other", "same", "right", "left",
    "best", "better", "sure", "free", "true", "full", "whole", "clear",
    "recent", "certain", "major", "similar", "single", "strong", "common",
    "fast", "slow",
}

# frequent lowercase words: a sentence-initial capitalized token whose
# lowercase form appears here is NOT treated as a proper noun
COMMON_WORDS = (
    DET | AUX | ADP | PRON | CCONJ | SCONJ | ADV | VERB | ADJ
    | {
        "man", "woman", "son", "daughter", "father", "mother", "brother",
        "sister", "people", "person", "time", "year", "day", "way", "thing",
        "world", "life", "hand", "part", "place", "case", "week", "company",
        "system", "program", "question", "government", "number", "night",
        "point", "home", "water", "room", "area", "money", "story", "fact",
        "month", "book", "eye", "job", "word", "business", "issue", "side",
        "kind", "head", "house", "service", "friend", "power", "hour", "game",
        "line", "end", "member", "law", "car", "city", "community", "name",
        "president", "team", "minute", "idea", "body", "information", "back",
        "parent", "face", "others", "level", "office", "door", "health",
        "art", "war", "history", "party", "result", "morning", "reason",
        "research", "girl", "boy", "moment", "air", "teacher", "force",
        "education", "filmmaker", "intellectual", "director", "actor",
        "actress", "spot", "dog", "cat", "film", "films", "premiere",
        "crowd", "critics", "reviews", "staging", "festival", "days",
        "wrote", "drew", "continued",
    }
)

# irregular lemmas (surface -> lemma); applied after lowercasing
IRREGULAR_LEMMA = {
    "is": "be", "are": "be", "was": "be", "were": "be", "am": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do",
    "goes": "go", "went": "go", "gone": "go",
    "made": "make", "said": "say", "saw": "see", "seen": "see",
    "ran": "run", "came": "come", "got": "get", "gave": "give",
    "took": "take", "taken": "take", "knew": "know", "known": "know",
    "thought": "think", "told": "tell", "found": "find", "felt": "feel",
    "left": "leave", "kept": "keep", "met": "meet", "paid": "pay",
    "shot": "shoot",
    "sat": "sit", "stood": "stand", "lost": "lose", "wrote": "write",
    "written": "write", "spoke": "speak", "spoken": "speak", "read": "read",
    "grew": "grow", "grown": "grow", "won": "win", "sent": "send",
    "built": "build", "fell": "fall", "children": "child", "men": "man",
    "women": "woman", "mice": "mouse", "feet": "foot", "teeth": "tooth",
    "people": "people", "better": "good",
}

# nouns ending in -ing/-ed that must not be stripped as verb inflection
ING_ED_NOUNS = {
    "thing", "king", "ring", "spring", "string", "wing", "morning",
    "evening", "building", "meeting", "feeling", "being", "during",
    "nothing", "something", "anything", "everything", "ceiling", "sibling",
    "hundred", "red", "bed", "need", "seed", "speed", "feed", "breed",
    "creed", "deed", "weed",
}

# NER label gazetteer: lowercase surface -> OntoNotes-style label.
# Everything capitalized and unlisted defaults to PERSON for multi-token
# runs and to the single-token default below.
GAZETTEER_GPE = {
    "germany", "america", "france", "spain", "china", "japan", "india",
    "brazil", "canada", "mexico", "italy", "russia", "poland", "austria",
    "bavaria", "munich", "berlin", "paris", "london", "tokyo", "california",
    "texas", "york", "england", "scotland", "ireland", "australia",
    "egypt", "kenya", "nigeria", "peru", "chile", "cuba", "norway",
    "sweden", "denmark", "finland", "iceland", "greece", "turkey",
    "portugal", "belgium", "netherlands", "switzerland",
    "united states", "new york", "los angeles", "san francisco",
    "united kingdom", "south africa", "new zealand",
}

GAZETTEER_ORG = {
    "google", "amazon", "microsoft", "apple", "netflix", "siemens", "bosch",
    "toyota", "honda", "samsung", "intel", "nvidia", "oracle", "ibm",
    "boeing", "airbus", "nasa", "unesco", "interpol",
}

# NER label -> class IRI metadata; mirrors the reference's NER_MAP
# (reference: textgraphs/kg.py:52-143) — public DBPedia ontology IRIs.
NER_MAP = {
    "CARDINAL": ("http://dbpedia.org/resource/Cardinal_number", "Numerals that do not fall under another type", "cardinal number"),
    "DATE": ("http://dbpedia.org/ontology/date", "Absolute or relative dates or periods", "date"),
    "EVENT": ("http://dbpedia.org/ontology/Event", "Named hurricanes, battles, wars, sports events, etc.", "event"),
    "FAC": ("http://dbpedia.org/ontology/Infrastructure", "Buildings, airports, highways, bridges, etc.", "infrastructure"),
    "GPE": ("http://dbpedia.org/ontology/Country", "Countries, cities, states", "country"),
    "LANGUAGE": ("http://dbpedia.org/ontology/Language", "Any named language", "language"),
    "LAW": ("http://dbpedia.org/ontology/Law", "Named documents made into laws", "law"),
    "LOC": ("http://dbpedia.org/ontology/Place", "Non-GPE locations, mountain ranges, bodies of water", "place"),
    "MONEY": ("http://dbpedia.org/resource/Money", "Monetary values, including unit", "money"),
    "NORP": ("http://dbpedia.org/ontology/nationality", "Nationalities or religious or political groups", "nationality"),
    "ORDINAL": ("http://dbpedia.org/resource/Ordinal_number", "Ordinal number, i.e., first, second, etc.", "ordinal number"),
    "ORG": ("http://dbpedia.org/ontology/Organisation", "Companies, agencies, institutions, etc.", "organization"),
    "PERCENT": ("http://dbpedia.org/resource/Percentage", "Percentage", "percentage"),
    "PERSON": ("http://dbpedia.org/ontology/Person", "People, including fictional", "person"),
    "PRODUCT": ("http://dbpedia.org/ontology/product", "Vehicles, weapons, foods, etc. (Not services)", "product"),
    "QUANTITY": ("http://dbpedia.org/resource/Quantity", "Measurements, as of weight or distance", "quantity"),
    "TIME": ("http://dbpedia.org/ontology/time", "Times smaller than a day", "time"),
    "WORK OF ART": ("http://dbpedia.org/resource/Work_of_art", "Titles of books, songs, etc.", "work of art"),
}

# RDF namespace prefixes for compact IRIs (reference: textgraphs/kg.py:145-162)
NS_PREFIX = {
    "dbc": "http://dbpedia.org/resource/Category:",
    "dbt": "http://dbpedia.org/resource/Template:",
    "dbr": "http://dbpedia.org/resource/",
    "yago": "http://dbpedia.org/class/yago/",
    "dbd": "http://dbpedia.org/datatype/",
    "dbo": "http://dbpedia.org/ontology/",
    "dbp": "http://dbpedia.org/property/",
    "units": "http://dbpedia.org/units/",
    "wd_ent": "http://www.wikidata.org/entity/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "schema": "https://schema.org/",
    "owl": "http://www.w3.org/2002/07/owl#",
}

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
