"""Deterministic fixture corpora (FIXTURES.md §1-§2).

Banking-FAQ style questions engineered so that:
  * several noun phrases recur > PHRASES_FREQ_THRESHOLD(2) times
    ("neft service", "credit card", "account balance", "fund transfer"),
  * several unigrams recur > UNIGRAM_FREQ_THRESHOLD(5) times,
  * verbs recur >= 2 times ("transfer", "pay", "check"),
  * one question hits the single-content-word fallback tag ("Timings?"),
  * equal-count substring pairs exist to exercise the A3 dedup,
  * contractions + punctuation exercise the normalize chain.

Includes the reference's canonical worked example
(/root/reference/strategy/phrase_finder.py:83).
"""

FAQ_QUESTIONS: list[str] = [
    "How does the e-monies NEFT service differ from RGTS and EFT?",
    "What is the NEFT service and how can I use the NEFT service?",
    "Can I schedule an e-monies NEFT service payment for a later date?",
    "What are the charges for the NEFT service on savings accounts?",
    "How do I check my account balance online?",
    "Can I check my account balance using the mobile app?",
    "What's the fastest way to check my account balance?",
    "Why doesn't my account balance update after a fund transfer?",
    "How long does a fund transfer take between banks?",
    "Is there a limit on fund transfer amounts per day?",
    "Can I cancel a fund transfer after it has been submitted?",
    "How do I apply for a credit card?",
    "What documents are required for a credit card application?",
    "How can I increase my credit card limit?",
    "What happens if I miss a credit card payment?",
    "Can I pay my credit card bill through the mobile app?",
    "How do I block a lost credit card?",
    "What is the annual fee for the platinum credit card?",
    "How do I reset my internet banking password?",
    "I can't remember my internet banking password, what should I do?",
    "Is internet banking available on weekends?",
    "How secure is internet banking compared to the mobile app?",
    "How do I register for the mobile app?",
    "Which phones support the mobile app?",
    "Why won't the mobile app accept my password?",
    "Can I open a savings account online?",
    "What is the minimum balance for a savings account?",
    "What interest rate applies to a savings account?",
    "Can a minor open a savings account with a guardian?",
    "How do I close my savings account?",
    "What are the branch timings on Saturdays?",
    "Timings?",
    "Are RTGS transfers available on bank holidays?",
    "What is the difference between RTGS and IMPS transfers?",
    "How do I update my registered mobile number?",
    "Can I update my email address through internet banking?",
    "What should I do if my debit card is stolen?",
    "How do I activate my new debit card?",
    "Can I use my debit card abroad?",
    "What are the withdrawal limits for a debit card at ATMs?",
    "How do I download my account statement?",
    "Can I get my account statement emailed every month?",
    "Who do I contact for a failed transaction?",
    "When will a failed transaction be refunded?",
    "Do you charge for duplicate account statement copies?",
    "How can I transfer money to an international account?",
    "What exchange rate applies when I transfer money abroad?",
    "Is it safe to transfer money using public wifi?",
]

# (primary_index, alt_question) pairs for alternate-question fixtures
FAQ_ALTERNATES: list[tuple[int, str]] = [
    (0, "In what way is e-monies NEFT different from RGTS?"),
    (4, "Where can I see my account balance?"),
    (11, "What's the process to get a credit card?"),
    (18, "Forgot my internet banking password"),
]
