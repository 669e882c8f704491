package graft

import java.sql.Date

import graft.model._

/** Ports of the reference's pytest fixtures (FIXTURES.md §A2 /
  * test_tasks.py:50-79) plus a fuller day for the nested extractors.
  */
object Fixtures {
  val user = "fake@fakest.com"
  def d(s: String): Date = Date.valueOf(s)

  /** The three-day fixture pinning notes/water/measurements semantics. */
  val fakeDays: Seq[MaterializedDay] = Seq(
    MaterializedDay(user, d("2021-01-01"), Seq.empty, Seq(Seq.empty, Seq.empty),
      Map.empty, Map("type" -> "food", "body" -> "notable"), 0.0,
      Map("Weight" -> 88.8, "Mood" -> 5.0)),
    MaterializedDay(user, d("2021-01-02"), Seq.empty, Seq(Seq.empty, Seq.empty),
      Map.empty, Map("type" -> "food", "body" -> ""), 2160.0, Map.empty),
    MaterializedDay(user, d("2021-01-03"), Seq.empty, Seq(Seq.empty, Seq.empty),
      Map.empty, Map("type" -> "food", "body" -> "noted"), 1500.0,
      Map("Weight" -> 88.0)))

  /** A richer day exercising meals/entries/exercises/goals extraction. */
  val fullDay: MaterializedDay = MaterializedDay(
    user, d("2021-02-01"),
    meals = Seq(
      Meal("breakfast",
        Map("calories" -> 500.0, "carbohydrates" -> 60.0, "fat" -> 20.0,
          "protein" -> 25.0, "sodium" -> 800.0, "sugar" -> 15.0),
        Seq(
          MealEntry("eggs", Some(2.0), Some("unit"),
            Map("calories" -> 180.0, "protein" -> 12.0)),
          MealEntry("toast", Some(1.0), Some("slice"),
            Map("calories" -> 320.0, "carbohydrates" -> 60.0)))),
      Meal("lunch",
        Map("calories" -> 700.0), // other nutrients absent → NULL columns
        Seq.empty)),
    exercises = Seq(
      Seq(Exercise("running",
        Map("minutes" -> 30.0, "calories burned" -> 350.0))),
      Seq(Exercise("bench press",
        Map("sets" -> 3.0, "reps/set" -> 10.0, "weight/set" -> 60.0)))),
    goals = Map("calories" -> 2000.0, "carbohydrates" -> 250.0,
      "fat" -> 70.0, "protein" -> 100.0), // sodium/sugar absent → NULL
    notes = Map("type" -> "food", "body" -> "big day"),
    water = 1800.0,
    measurements = Map("Weight" -> 87.5))
}
